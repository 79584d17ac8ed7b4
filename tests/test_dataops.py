"""Training-data pipeline operators vs independent pure-Python oracles,
over the driver-provided sf0.001 documents/embeddings tables."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from img_spark.operators import dedup, similarity
from img_spark.operators.multimodal import (
    decode_media,
    extract_features,
    sample_frames,
    synth_media_df,
)
from img_spark.operators.textquality import (
    STOPWORDS,
    fingerprint,
    h32,
    lang_id,
    quality_signals,
    token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def local_docs(docs):
    return [(r["doc_id"], r["text"]) for r in docs.collect()]


def py_h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def py_grams(text: str, n=3):
    toks = text.strip().lower().split()
    if len(toks) < n:
        return {py_h32(" ".join(toks))}
    return {py_h32(" ".join(toks[i:i + n])) for i in range(len(toks) - n + 1)}


def test_h32_portable(spark):
    got = spark.range(1).select(h32(F.lit("abc")).alias("h")).first()["h"]
    import duckdb

    want = duckdb.sql("select ('0x'||substr(md5('abc'),1,8))::bigint").fetchone()[0]
    assert got == want == py_h32("abc")


def test_token_count(docs, local_docs):
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    import re

    for did, text in local_docs:
        assert got[did] == len(re.split(r"\s+", text.strip().lower()))


def test_exact_dedup(docs, local_docs):
    import re

    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower())

    fp2ids = {}
    for did, text in local_docs:
        fp2ids.setdefault(norm(text), []).append(did)
    expected_dups = {
        did
        for ids in fp2ids.values()
        for did in ids
        if len(ids) > 1 and did != min(ids)
    }
    got = {
        r["doc_id"]
        for r in dedup.exact_dedup(docs).filter(F.col("is_dup")).collect()
    }
    assert got == expected_dups


def test_jaccard_pairs_exact_oracle(docs, local_docs):
    grams = {did: py_grams(t) for did, t in local_docs}
    expect = {}
    ids = sorted(grams)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(grams[a] & grams[b])
            if not inter:
                continue
            j = inter / (len(grams[a]) + len(grams[b]) - inter)
            if j >= 0.5:
                expect[(a, b)] = round(j, 6)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert got == expect


def test_minhash_lsh_recall(docs, local_docs):
    """LSH candidates must cover all true near-dups at 0.8 similarity
    (8 bands × 4 rows → ~99.9% recall at j=0.8), and the verified
    pipeline must return exactly the true pairs above threshold."""
    grams = {did: py_grams(t) for did, t in local_docs}
    ids = sorted(grams)
    true_pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(grams[a] & grams[b])
            union = len(grams[a]) + len(grams[b]) - inter
            if union and inter / union >= 0.8:
                true_pairs.add((a, b))
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(docs).collect()
    }
    assert true_pairs <= cand
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_dedup(docs, threshold=0.8).collect()
    }
    assert verified == true_pairs


def test_simhash_python_parity(docs, local_docs):
    def py_simhash(text):
        toks = sorted(set(text.strip().lower().split()), key=text.strip().lower().split().index) if False else list(dict.fromkeys(text.strip().lower().split()))
        acc = [0] * 32
        for w in toks:
            h = py_h32(w)
            for j in range(32):
                acc[j] += 1 if (h >> j) & 1 else -1
        return sum(1 << j for j in range(32) if acc[j] > 0)

    got = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", dedup.simhash32(F.col("text")).alias("sh")
        ).collect()
    }
    for did, text in local_docs[:50]:
        assert got[did] == py_simhash(text), did


def test_simhash64_agg_matches_expression_form(docs):
    """The explode+agg 64-bit signature must equal the per-row fold
    form word-for-word (same property the 32-bit pair had), and sh_lo
    must equal the legacy 32-bit signature (word-0 compatibility)."""
    expr = docs.select(
        "doc_id",
        dedup.simhash32(F.col("text")).alias("e_lo"),
        dedup.simhash32(F.col("text"), salt="#2").alias("e_hi"),
    )
    agg = dedup.simhash64_agg(docs)
    j = expr.join(agg, "doc_id")
    bad = j.filter(
        (F.col("e_lo") != F.col("sh_lo")) | (F.col("e_hi") != F.col("sh_hi"))
    ).count()
    assert bad == 0
    legacy = dedup.simhash32_agg(docs)
    assert j.join(legacy, "doc_id").filter(
        F.col("sh") != F.col("sh_lo")
    ).count() == 0


def test_simhash_band_space_survives_scale(spark):
    """Round-3 verdict: 8-bit chunks gave 256 buckets/band — every
    bucket holds N/256 docs at corpus scale and the per-bucket
    quadratic join explodes. Pin the 16-bit layout: on a skewed-ish
    2,000-doc corpus each band must spread across ≫256 distinct chunks
    (near-birthday occupancy of the 65,536-bucket space), and no single
    bucket may exceed a tiny share of the docs."""
    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(4000)]
    rows = [
        (i, " ".join(rng.sample(words, 30))) for i in range(2000)
    ]
    docs_df = spark.createDataFrame(rows, "doc_id long, text string")
    banded = dedup.simhash_bands(docs_df).groupBy("band", "chunk").count()
    stats = banded.groupBy("band").agg(
        F.count("*").alias("n_chunks"), F.max("count").alias("max_bucket")
    ).collect()
    assert len(stats) == 4
    for r in stats:
        assert r["n_chunks"] > 1000, r   # impossible with 256 buckets
        assert r["max_bucket"] <= 20, r  # ≤1% of docs in any bucket


def test_simhash_near_dups_recall_on_planted_flips(spark):
    """Hamming < bands ⇒ a band chunk matches: plant doc pairs whose
    64-bit signatures differ in ≤3 bits (tiny token edits on long
    docs) and require every such pair in the candidate set."""
    import random

    rng = random.Random(11)
    words = [f"tok{i}" for i in range(3000)]
    rows = []
    for i in range(50):
        base = rng.sample(words, 120)
        edited = list(base)
        edited[0] = f"edit{i}"  # one-token edit on a 120-token doc
        rows.append((i, " ".join(base)))
        rows.append((1000 + i, " ".join(edited)))
    docs_df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {
        r["doc_id"]: (r["sh_lo"], r["sh_hi"])
        for r in dedup.simhash64_agg(docs_df).collect()
    }
    want = set()
    for i in range(50):
        (alo, ahi), (blo, bhi) = sig[i], sig[1000 + i]
        ham = bin(alo ^ blo).count("1") + bin(ahi ^ bhi).count("1")
        if ham < 4:
            want.add((i, 1000 + i))
    assert want  # the fixture must actually produce close pairs
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_dups(docs_df).collect()
    }
    assert want <= got


def test_lang_id(docs):
    """The synthetic docs carry a lang column; the heuristic should get
    the CJK rows right and be deterministic everywhere."""
    out = docs.select("doc_id", "lang", lang_id(F.col("text")).alias("pred"))
    # deterministic: same result on re-run
    a = {r["doc_id"]: r["pred"] for r in out.collect()}
    b = {r["doc_id"]: r["pred"] for r in out.collect()}
    assert a == b


def test_bpe_vocab_real_merges_and_fallback(spark, tmp_path):
    """token_count_bpe with an on-disk merges file runs the REAL greedy
    merge loop (hand-derived counts); without a vocab it is exactly the
    regex estimator (the oracle-checked default)."""
    from img_spark.operators.textquality import (
        load_bpe_merges,
        token_count_bpe,
        token_count_bpe_regex,
    )

    p = tmp_path / "merges.txt"
    p.write_text("#version: test\nl o\nlo w\ne r\nh e\n")
    merges = load_bpe_merges(str(p))
    assert merges == [("l", "o"), ("lo", "w"), ("e", "r"), ("h", "e")]
    df = spark.createDataFrame(
        [(0, "low lower"), (1, "hhh"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", token_count_bpe(F.col("text"), merges).alias("n")
        ).collect()
    }
    # 'low lower': pieces ['low', ' lower'];
    #   'low' -> lo w -> low                    = 1 token
    #   ' lower' -> ' h'? no: [' ','l','o','w','e','r']
    #     -> merge (l,o) -> [' ','lo','w','e','r']
    #     -> merge (lo,w) -> [' ','low','e','r']
    #     -> merge (e,r) -> [' ','low','er']    = 3 tokens
    assert got[0] == 4
    # 'hhh': (h,e) never applies; no (h,h) merge -> 3 chars
    assert got[1] == 3
    assert got[2] == 0
    assert got[3] is None
    # no vocab -> identical to the regex estimator column
    est = df.select(
        "doc_id",
        token_count_bpe(F.col("text")).alias("a"),
        token_count_bpe_regex(F.col("text")).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in est)


def test_bpe_demo_merges_closed_form_equivalence(spark):
    """The driver query's oracle rests on a closed form: with merges
    [("e","r"), ("er","s")] the REAL greedy loop's token count equals
    chars − count("er") − count("ers") (non-overlapping counts). Pin
    the equivalence on the adversarial shapes the proof worries about
    (overlap, rank ordering, piece boundaries, repeated runs)."""
    import re

    from img_spark.operators.textquality import token_count_bpe

    merges = [("e", "r"), ("er", "s")]
    texts = [
        "er", "ers", "erser", "serser", "erers", "eers", "errs", "rer",
        "erse", "ererer", "eererr", "the worker reuses erasers",
        "ER er Er", "e r s", "ers!ers? er-s", "  er   ers ", "", "sss",
        "user's browsers err; versers rehearse", "ersersers",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", token_count_bpe(F.col("text"), merges).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        want = len(t) - len(re.findall("er", t)) - len(re.findall("ers", t))
        assert got[i] == want, (t, got[i], want)


def test_lang_id_model_hook(spark):
    """A plugged batch classifier runs Arrow-batched and its labels
    come through verbatim; rows reach it in order."""
    from img_spark.operators.textquality import lang_id_with_model

    def model(texts):
        return ["zz" if "x" in (t or "") else "en" for t in texts]

    df = spark.createDataFrame(
        [(0, "hello"), (1, "xylophone"), (2, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", lang_id_with_model(F.col("text"), model).alias("lang")
        ).collect()
    }
    assert got == {0: "en", 1: "zz", 2: "en"}


def test_load_lang_model_demo_scoring():
    """The shipped demo model (resources/lang_model_demo.txt): weight
    sums over token occurrences, argmax with lexicographic tie-break,
    'und' on zero evidence — the closed-form contract the lang_id
    driver oracle replays in SQL."""
    import os

    from img_spark.operators import textquality as tq

    model = tq.load_lang_model(os.path.join(
        os.path.dirname(os.path.abspath(tq.__file__)), "..",
        "resources", "lang_model_demo.txt",
    ))
    got = model([
        "the cat and the dog",      # en: 2+1+2 = 5
        "Der Hund und die Katze",   # de: 2+2+1.5 (case-folded)
        "le et les",                # fr
        "el y los",                 # es: 2+1+1.5 = 4.5
        "nothing matches here",     # no evidence
        None,                       # null-safe
        "the the und und",          # en 4.0 = de 4.0 → tie: 'de' < 'en'
    ])
    assert got == ["en", "de", "fr", "es", "und", "und", "de"]


def test_quality_signals(docs, local_docs):
    got = {r["doc_id"]: r for r in quality_signals(docs).collect()}
    for did, text in local_docs[:30]:
        toks = text.strip().lower().split()
        assert got[did]["n_tokens"] == len(toks)
        assert got[did]["n_chars"] == len(text)
        punct = sum(text.count(c) for c in ".,!?;:")
        assert got[did]["punct_chars"] == punct


def test_cosine_topk_vs_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    queries = emb.filter(F.col("vec_id") < 5)
    got = similarity.cosine_topk(emb, queries, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["corpus_id"], r["sim"]))
    for q in range(5):
        sims = []
        for cid, v in vecs.items():
            if cid == q:
                continue
            s = float(vecs[q] @ v / (np.linalg.norm(vecs[q]) * np.linalg.norm(v)))
            sims.append((round(s, 6), -cid))
        sims.sort(reverse=True)
        want = [(-c, s) for s, c in sims[:3]]
        have = [(c, s) for _, c, s in sorted(by_q[q])]
        assert have == want, q


def test_lsh_topk_shape(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    out = similarity.lsh_topk(emb, queries, k=3).collect()
    assert all(r["rank"] <= 3 for r in out)
    assert {r["query_id"] for r in out} <= {0, 1, 2}


def test_multimodal_plumbing(spark):
    media = synth_media_df(spark, 32).cache()
    dec = decode_media(media).collect()
    assert len(dec) == 32 and all(r["decode_ok"] for r in dec)
    assert all(r["n_frames"] >= 1 for r in dec)
    feats = extract_features(media).collect()
    assert len(feats) == 32 and all(len(r["features"]) == 16 for r in feats)
    # determinism across runs
    feats2 = extract_features(media).collect()
    assert {r["media_id"]: list(r["features"]) for r in feats} == {
        r["media_id"]: list(r["features"]) for r in feats2
    }
    frames = sample_frames(media).collect()
    assert frames and all(r["ts_ms"] % 1000 == 0 for r in frames)


def test_resize_plumbing(spark):
    from img_spark.operators.multimodal import resize_image, synth_media_df

    media = synth_media_df(spark, 30)
    out = resize_image(media, max_side=128).collect()
    assert out and all(r["resize_ok"] for r in out)
    assert all(max(r["width"], r["height"]) <= 128 for r in out)
    assert all(r["width"] >= 1 and r["height"] >= 1 for r in out)


def test_ivf_topk_structure_and_overlap(spark):
    """IVF probe path: ranks well-formed, sims consistent with the exact
    baseline for the pairs it does surface, and nprobe=all-centroids
    degenerates to the exact result."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4)
    rows = out.collect()
    assert all(1 <= r["rank"] <= 3 for r in rows)
    exact = {
        (r["query_id"], r["corpus_id"]): r["sim"]
        for r in similarity.cosine_topk(emb, queries, k=3).collect()
    }
    # every surfaced sim equals the exact cosine for that pair
    ex_all = {
        (r["query_id"], r["corpus_id"]): r["sim"]
        for r in similarity.cosine_topk(
            emb, queries, k=emb.count()
        ).collect()
    }
    for r in rows:
        assert ex_all[(r["query_id"], r["corpus_id"])] == r["sim"]
    # probing EVERY list recovers the exact top-k
    full = similarity.ivf_topk(
        emb, queries, k=3, n_centroids=16, nprobe=16
    ).collect()
    assert {
        (r["query_id"], r["corpus_id"], r["sim"]) for r in full
    } == {(q, c, s) for (q, c), s in exact.items()}


def test_connected_components_known_graph(spark):
    """Chain 1-2-3-4, triangle 10-11-12 (via pairs), isolated pair
    20-21: min-label propagation converges to the component minimum."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    out = {r["doc_id"]: r["rep_id"]
           for r in dedup.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_ivf_assignment_no_window_over_product(spark):
    """Round-2 verdict item 5: centroid assignment must be a
    map-combinable max_by aggregate — a row_number window over the
    corpus×centroids product would shuffle n_centroids× the corpus.
    Exactly two windows remain (query probe top-nprobe + final top-k),
    both over query-sized data."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = similarity.ivf_topk(emb, emb.limit(3), k=2, n_centroids=8, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("- Window [") == 2  # WindowGroupLimit nodes excluded
    assert "partial_max_by" in plan  # assignment map-side combines


def test_kmeans_centroids_through_same_plan(spark):
    """Trained centroids feed ivf_topk through the identical plan; on
    two well-separated synthetic clusters Lloyd's converges to the two
    cluster means and nprobe=1 already recovers same-cluster
    neighbours."""
    import numpy as np

    rows = []
    for i in range(20):
        base = [10.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 10.0, 0.0, 0.0]
        vec = [b + ((i * 7 + j) % 5) * 0.01 for j, b in enumerate(base)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = similarity.kmeans_centroids(emb, n_centroids=2, iters=4)
    got = {r["centroid_id"]: r["ev"] for r in cent.collect()}
    assert len(got) == 2
    # each trained centroid points at one cluster axis
    axes = sorted(int(np.argmax(v)) for v in got.values())
    assert axes == [0, 1]
    out = similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 2), k=3, nprobe=1, centroids=cent
    ).collect()
    for r in out:
        # neighbours come from the query's own cluster (same parity)
        assert r["corpus_id"] % 2 == r["query_id"] % 2


def test_hot_bucket_guard_bounds_work_and_reports(spark):
    """Plant one mega-bucket (many identical docs): with max_bucket the
    candidate set is bounded and the drop report carries the truncation
    ledger — silent full-coverage reads are impossible."""
    rows = [(i, "the same boilerplate page text again and again")
            for i in range(60)]
    rows += [(100, "a unique document about spark"),
             (101, "a unique document about spark")]
    docs_df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.minhash_lsh_candidates(docs_df, max_bucket=10)
    got = capped.collect()
    # the 60-doc mega-bucket (60*59/2=1770 pairs/band) is dropped; the
    # small pair survives
    assert (100, 101) in {(r["doc_a"], r["doc_b"]) for r in got}
    assert all(r["doc_a"] >= 100 for r in got)
    banded = dedup.minhash_bands(docs_df)
    report = dedup.bucket_drop_report(banded, ("band", "bucket"), 10)
    rep = report.collect()
    assert rep and all(r["n"] == 60 and r["dropped_pairs"] == 1770 for r in rep)
    # embedding path: one hot LSH bucket of identical vectors
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(50)]
        + [(200, [0.0, -1.0, 0.0, 0.0]), (201, [0.0, -1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = similarity.embedding_near_dups(
        emb, threshold=0.9, n_planes=4, dim=4, max_bucket=10
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(200, 201)}
    # simhash path accepts the cap too
    sim = dedup.simhash_near_dups(docs_df, max_bucket=10).collect()
    assert all(r["doc_a"] >= 100 for r in sim)


def test_null_text_docs_excluded_from_lsh_by_design(spark):
    """Pinned behavior (round-2 advice): NULL-text docs emit no
    signature row and never reach candidate pairs; empty-STRING docs
    keep the h32('') signature and still pair with each other."""
    docs_df = spark.createDataFrame(
        [(0, None), (1, None), (2, ""), (3, "  "), (4, "real text here")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"] for r in dedup.minhash_signatures(docs_df).collect()}
    assert sigs == {2, 3, 4}
    cand = {(r["doc_a"], r["doc_b"])
            for r in dedup.minhash_lsh_candidates(docs_df).collect()}
    assert (2, 3) in cand
    assert all(a not in (0, 1) and b not in (0, 1) for a, b in cand)
    sh = {r["doc_id"] for r in dedup.simhash32_agg(docs_df).collect()}
    assert sh == {2, 3, 4}
    near = dedup.simhash_near_dups(docs_df).collect()
    assert all(r["doc_a"] not in (0, 1) and r["doc_b"] not in (0, 1)
               for r in near)


def test_ngram_decontaminate_planted(spark):
    """Docs sharing a 3-gram with the benchmark are flagged; clean docs
    are not; every input doc gets a row (null-text docs count as clean,
    not dropped)."""
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs_df = spark.createDataFrame(
        [
            (1, "totally unrelated content about spark engines"),
            (2, "he said the quick brown fox appeared at dawn"),  # overlap
            (3, "the quick brown fox jumps over the lazy dog"),   # verbatim
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["contaminated"], r["bench_hits"])
           for r in dedup.ngram_decontaminate(docs_df, bench).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == (False, 0)
    assert got[2][0] is True and got[2][1] >= 2  # 'the quick brown' etc.
    assert got[3][0] is True and got[3][1] == 7  # all 7 distinct 3-grams
    assert got[4] == (False, 0)


def test_curate_corpus_gates_compose(spark):
    """keep == quality AND lang AND not-dup AND not-contaminated, with
    each component flag observable."""
    from img_spark.operators.textquality import curate_corpus

    good = ("a perfectly reasonable english document with enough words "
            "to pass the quality gates and no duplicated content here "
            "it keeps going with more plain text for the token floor")
    docs_df = spark.createDataFrame(
        [
            (1, good),
            (2, good),                      # exact dup of 1 → dropped
            (3, "too short"),               # fails quality floor
            (4, good + " extra tail words making it unique and fine"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "no overlap with anything in that corpus whatsoever")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           curate_corpus(docs_df, benchmark=bench).collect()}
    assert got[1]["keep"] and not got[1]["is_dup"]
    assert not got[2]["keep"] and got[2]["is_dup"]
    assert not got[3]["keep"] and not got[3]["quality_keep"]
    assert got[4]["keep"]
    # contaminate doc 4 via a benchmark that quotes it
    bench2 = spark.createDataFrame(
        [(0, "extra tail words making it unique")],
        "doc_id long, text string",
    )
    got2 = {r["doc_id"]: r for r in
            curate_corpus(docs_df, benchmark=bench2).collect()}
    assert got2[4]["contaminated"] and not got2[4]["keep"]
    assert got2[1]["keep"]  # 'keeps going with more plain text' ≠ quote


def test_stratified_sample_deterministic_and_rate(spark):
    """Sampling is a pure hash: identical across runs, independent of
    partitioning, and each stratum's keep fraction tracks its rate."""
    from img_spark.operators.textquality import stratified_sample

    docs_df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.lit("x").alias("text"),
    )
    out = stratified_sample(docs_df, {"en": 0.5, "de": 0.1})
    a = {r["doc_id"]: r["sampled"] for r in out.collect()}
    b = {r["doc_id"]: r["sampled"]
         for r in stratified_sample(docs_df.repartition(13),
                                    {"en": 0.5, "de": 0.1}).collect()}
    assert a == b  # partitioning-independent
    kept = out.filter("sampled").groupBy("stratum").count().collect()
    frac = {r["stratum"]: r["count"] / 2000 for r in kept}
    assert abs(frac["en"] - 0.5) < 0.05
    assert abs(frac["de"] - 0.1) < 0.03
    # pure projection: no shuffle at any scale
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_lines_ccnet_style(spark):
    """Line-level dedup: the globally FIRST occurrence of a
    substantive line survives (smallest (doc_id, pos) — deterministic),
    later copies drop (cross-doc AND intra-doc), short lines are
    exempt, and documents reassemble in original order."""
    from img_spark.operators.dedup import dedup_lines

    boiler = "accept our cookies to continue browsing this website"
    nav = "home | products | about us | contact | privacy policy"
    docs = [
        ("d1", f"{boiler}\nunique first doc line with enough length\n"
               f"{nav}\nok"),
        # d2 repeats the boilerplate AND the nav; its own line survives
        ("d2", f"{boiler}\nsecond document distinctive content line\n{nav}"),
        # d0 sorts BEFORE d1: its copy of boiler is the global first
        ("d0", f"intro line that is long enough to be eligible\n{boiler}"),
        # intra-doc duplicate of a long line
        ("d3", "repeated paragraph inside one single document here\n"
               "repeated paragraph inside one single document here"),
    ]
    out = {
        r["doc_id"]: r
        for r in dedup_lines(
            spark.createDataFrame(docs, "doc_id string, text string")
        ).collect()
    }
    # d0 owns the boilerplate's first occurrence
    assert out["d0"]["text"] == docs[2][1]
    assert out["d0"]["n_removed"] == 0
    # d1 keeps nav (its first global occurrence: d1.pos2 < d2.pos2)
    # but loses the boilerplate to d0; 'ok' is short → exempt
    assert out["d1"]["text"] == (
        "unique first doc line with enough length\n" + nav + "\nok"
    )
    assert out["d1"]["n_removed"] == 1
    # d2 loses both repeated lines
    assert out["d2"]["text"] == "second document distinctive content line"
    assert out["d2"]["n_removed"] == 2
    # intra-doc: first copy survives, second drops
    assert out["d3"]["text"] == (
        "repeated paragraph inside one single document here"
    )
    assert out["d3"]["n_removed"] == 1
    assert out["d3"]["n_lines"] == 2

    # determinism across partitionings
    df = spark.createDataFrame(docs, "doc_id string, text string")
    a = sorted(map(tuple, dedup_lines(df.repartition(7)).collect()))
    b = sorted(map(tuple, dedup_lines(df.coalesce(1)).collect()))
    assert a == b
    # the first-occurrence aggregate must partial-aggregate map-side
    # (a hot boilerplate line must never melt one reducer) and the
    # plan must not contain a cartesian product
    plan = dedup_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "partial_min" in plan


def test_dedup_lines_preserves_null_text_docs(spark):
    """One row per INPUT doc even when text is NULL: F.split(NULL)
    explodes to zero rows, which would silently drop the doc — a
    caller replacing its text column via join on the result would
    lose those documents from the corpus with no error."""
    from img_spark.operators.dedup import dedup_lines

    docs = [
        ("d1", "a substantive line long enough to be eligible here"),
        ("d2", None),
        ("d3", "a substantive line long enough to be eligible here"),
    ]
    out = {
        r["doc_id"]: r
        for r in dedup_lines(
            spark.createDataFrame(docs, "doc_id string, text string")
        ).collect()
    }
    assert set(out) == {"d1", "d2", "d3"}  # nothing dropped
    assert out["d2"]["text"] is None
    assert out["d2"]["n_lines"] == 0 and out["d2"]["n_removed"] == 0
    assert out["d1"]["n_removed"] == 0 and out["d3"]["n_removed"] == 1
