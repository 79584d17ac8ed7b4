"""Link-graph frontier prioritization (operators/linkgraph.py):
PageRank must match a pure-Python reference exactly on dyadic inputs,
tolerate dangling nodes and duplicate edges, collapse to the host
graph correctly, and read edges back out of a crawl checkpoint."""

import pytest
from pyspark.sql import functions as F

from img_spark.operators.linkgraph import (
    host_graph,
    host_rank,
    link_edges,
    pagerank,
)


def _ref_pagerank(edges, iterations, damping):
    """Reference implementation (GraphX staticPageRank semantics):
    init 1.0, reset (1-d), dangling mass dropped."""
    from collections import defaultdict

    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        contrib = defaultdict(float)
        for s, dsts in out.items():
            share = ranks[s] / len(dsts)
            for d in dsts:
                contrib[d] += share
        ranks = {n: (1 - damping) + damping * contrib[n] for n in nodes}
    return ranks


EDGES = [
    # a small web: 0 is a hub, 3 is dangling, 4 links only to the hub
    (0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 0), (1, 3),
]


def test_pagerank_matches_reference_exactly(spark):
    """d=0.5 and power-of-two out-degrees make every intermediate a
    dyadic rational — sums are EXACT regardless of order, so Spark
    must equal the sequential reference bit-for-bit."""
    df = spark.createDataFrame(EDGES, "src bigint, dst bigint")
    got = {
        r["id"]: r["rank"]
        for r in pagerank(df, iterations=8, damping=0.5).collect()
    }
    want = _ref_pagerank(EDGES, 8, 0.5)
    assert got == want
    # the hub out-ranks the leaf pages
    assert got[0] > got[1]
    # the dangling node still RECEIVES rank (it has in-edges) even
    # though it redistributes nothing
    assert got[3] > 0.5


def test_pagerank_duplicate_edges_and_partitioning(spark):
    """Duplicate edges collapse (out-degree counts DISTINCT targets)
    and the result is identical across partitionings."""
    dup = EDGES + EDGES[:3]
    df = spark.createDataFrame(dup, "src bigint, dst bigint")
    a = sorted(pagerank(df.repartition(7), 8, 0.5).collect())
    b = sorted(pagerank(df.coalesce(1), 8, 0.5).collect())
    assert a == b
    assert {r["rank"] for r in a} == set(
        _ref_pagerank(EDGES, 8, 0.5).values()
    )


def test_pagerank_default_damping_close(spark):
    """With the conventional d=0.85 the floats are no longer dyadic —
    require agreement to 1e-12 instead of equality."""
    df = spark.createDataFrame(EDGES, "src bigint, dst bigint")
    got = {
        r["id"]: r["rank"] for r in pagerank(df, 10, 0.85).collect()
    }
    want = _ref_pagerank(EDGES, 10, 0.85)
    assert got.keys() == want.keys()
    for n in want:
        assert abs(got[n] - want[n]) < 1e-12


def test_pagerank_plan_shape(spark):
    """Scale shape: no cartesian product, the contribution aggregate
    partial-aggregates map-side (a mega-in-degree node must never
    melt one reducer before the combine)."""
    df = spark.createDataFrame(EDGES, "src bigint, dst bigint")
    plan = (
        pagerank(df, 2, 0.5, checkpoint_every=100, materialize=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan


def test_host_graph_collapses_and_drops_intra_host(spark):
    edges = [
        ("https://a.test/1", "https://b.test/x"),
        ("https://a.test/2", "https://b.test/y"),
        ("https://a.test/1", "https://a.test/3"),  # intra-host: dropped
        ("https://b.test/x", "https://c.test/"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_graph(df).collect()
    }
    assert got == {("a.test", "b.test"): 2, ("b.test", "c.test"): 1}


def test_host_rank_orders_endorsed_hosts(spark):
    """Many hosts endorsing one target must out-rank the endorsers."""
    edges = [
        (f"https://src{i}.test/p", "https://popular.test/")
        for i in range(8)
    ] + [("https://popular.test/", "https://src0.test/p")]
    df = spark.createDataFrame(edges, "src string, dst string")
    scores = {r["host"]: r["score"] for r in host_rank(df, 8, 0.5).collect()}
    assert scores["popular.test"] == max(scores.values())
    assert scores["popular.test"] > scores["src1.test"]


def test_link_edges_from_crawl_checkpoint(spark, tmp_path):
    """Edges come back out of a crawl checkpoint: parent_url → url for
    every enqueued row (albums + next links), seeds contribute none."""
    from img_spark.operators.politeness import robots_df
    from img_spark.plans.crawl import CrawlConfig, Crawler
    from img_spark.sources.site_config import rows_from_config
    from img_spark.sources.synthweb import (
        FIXTURE_CONFIG,
        FIXTURE_ROBOTS,
        fixture_pages_df,
    )

    ckpt = str(tmp_path / "ck")
    c = Crawler(
        spark, fixture_pages_df(spark), rows_from_config(FIXTURE_CONFIG),
        robots_df(spark, FIXTURE_ROBOTS),
        CrawlConfig(checkpoint_dir=ckpt, partitions=4),
    )
    seed = "https://site-a.test/"
    c.run(seeds=[seed])
    e = link_edges(spark, ckpt)
    rows = e.collect()
    assert len(rows) > 0
    srcs = {r["src"] for r in rows}
    dsts = {r["dst"] for r in rows}
    # the seed appears as a SOURCE (it linked to its albums) but is
    # nobody's destination — and no edge lacks an endpoint
    assert seed in srcs
    assert all(r["src"] and r["dst"] for r in rows)
    assert seed not in dsts
    # ranks computed over the discovered graph cover every linked URL
    ranks = pagerank(e, 4, 0.5)
    assert ranks.count() == len(srcs | dsts)


def test_dispatch_global_cap_unit(spark):
    """Global fleet capacity: of the per-host dispatch winners, only
    the global top-N by priority survive; cut rows flip to held and
    the plan's top-N is the distributed TakeOrdered, never a
    single-partition sort."""
    from img_spark.operators.politeness import (
        dispatch_global_cap,
        dispatch_top_k,
    )

    rows = [
        # (url, host, depth, path, score column host_score)
        (f"https://h{h}.test/p{i}", f"h{h}.test", 1, f"{i:08x}", float(h))
        for h in range(4)
        for i in range(3)
    ]
    pending = spark.createDataFrame(
        rows, "url string, host string, depth int, path string,"
        " host_score double",
    ).withColumn("crawl_delay", F.lit(0.0))
    marked = dispatch_top_k(
        pending, host_budget=2, order="score", score="host_score"
    )
    capped = dispatch_global_cap(
        marked, 3, order="score", score="host_score"
    )
    got = sorted(r["url"] for r in capped.filter("dispatch").collect())
    # per-host budget 2 → h3 contributes 2, then h2's first by (path,
    # url) tiebreak fills the third slot
    assert got == [
        "https://h2.test/p0", "https://h3.test/p0", "https://h3.test/p1",
    ]
    # everything else is held, nothing lost
    assert capped.count() == len(rows)
    assert capped.filter("not dispatch").count() == len(rows) - 3
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_rank_driven_crawl_prioritizes_scored_host(spark, tmp_path):
    """E2E rank-driven scheduling: with a host_scores table favoring
    site-b and a global budget of 1, the first generation's single
    fetch goes to site-b (not seed order), and the cut hosts carry
    over pending — the north-star priority-queue frontier."""
    from img_spark.operators.politeness import robots_df
    from img_spark.plans.crawl import CrawlConfig, Crawler, read_pending
    from img_spark.sources.site_config import rows_from_config
    from img_spark.sources.synthweb import (
        FIXTURE_CONFIG,
        FIXTURE_ROBOTS,
        fixture_pages_df,
    )

    scores = spark.createDataFrame(
        [("site-b.test", 10.0), ("site-a.test", 1.0)],
        "host string, score double",
    )
    ckpt = str(tmp_path / "ck")
    c = Crawler(
        spark, fixture_pages_df(spark), rows_from_config(FIXTURE_CONFIG),
        robots_df(spark, FIXTURE_ROBOTS),
        CrawlConfig(
            checkpoint_dir=ckpt, partitions=4, global_budget=1,
            priority="score", priority_score="host_score",
        ),
        host_scores=scores,
    )
    c.init(["https://site-a.test/", "https://site-b.test/gallery"])
    c.step()
    # generation 1 dispatched EXACTLY the scored host's URL; site-a
    # (score 1 < 10) was cut by the global cap and stays pending
    ext = spark.read.parquet(f"{ckpt}/extracted/g1")
    fetched = {
        r["page_url"] for r in ext.select("page_url").distinct().collect()
    }
    assert fetched == {"https://site-b.test/gallery"}
    still = {
        r["url"] for r in read_pending(spark, ckpt, 1).collect()
    }
    assert "https://site-a.test/" in still
    # next generation the carried-over row is still schedulable
    c.step()
    ext2 = spark.read.parquet(f"{ckpt}/extracted/g2")
    fetched2 = {
        r["page_url"] for r in ext2.select("page_url").distinct().collect()
    }
    assert fetched2  # something dispatched (site-b children outrank or
    # site-a comes through once b's frontier drains per the scores)


def test_pagerank_weighted(spark):
    """weight_col: an edge carries w/Σw(src) of its source's rank —
    exact vs a sequential weighted reference on dyadic fractions, and
    duplicate (src, dst) rows sum their weights."""
    from collections import defaultdict

    # dyadic weight fractions: node 0 splits 3:1 (w 6,2 → 0.75/0.25)
    edges = [(0, 1, 6.0), (0, 2, 2.0), (1, 2, 4.0), (2, 0, 8.0)]

    def ref(edges, iters, d):
        out = defaultdict(list)
        for s, t, w in edges:
            out[s].append((t, w))
        nodes = sorted({n for s, t, _ in edges for n in (s, t)})
        ranks = {n: 1.0 for n in nodes}
        for _ in range(iters):
            contrib = defaultdict(float)
            for s, tws in out.items():
                tot = sum(w for _, w in tws)
                for t, w in tws:
                    contrib[t] += ranks[s] * (w / tot)
            ranks = {n: (1 - d) + d * contrib[n] for n in nodes}
        return ranks

    df = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    got = {
        r["id"]: r["rank"]
        for r in pagerank(df, 8, 0.5, weight_col="w").collect()
    }
    assert got == ref(edges, 8, 0.5)
    # duplicate rows SUM: splitting 0→1's weight into 4.0+2.0 rows is
    # identical to the single 6.0 row
    dup = [(0, 1, 4.0), (0, 1, 2.0), (0, 2, 2.0), (1, 2, 4.0),
           (2, 0, 8.0)]
    df2 = spark.createDataFrame(dup, "src bigint, dst bigint, w double")
    got2 = {
        r["id"]: r["rank"]
        for r in pagerank(df2, 8, 0.5, weight_col="w").collect()
    }
    assert got2 == got


def test_pagerank_dual_matches_both_variants(spark):
    """pagerank_dual (the r8 fused loop the fingerprint harness runs)
    must be VALUE-IDENTICAL to the two separate pagerank() calls —
    bit-exact on dyadic inputs, including duplicate-edge weight
    summing. On a graph with a w<=0-only source, the dual's rank_w
    keeps the node at its (1-d) baseline (the documented union node
    set) while the weighted single variant omits it; all shared nodes
    still agree exactly."""
    from img_spark.operators.linkgraph import pagerank_dual

    edges = [(0, 1, 6.0), (0, 2, 2.0), (1, 2, 4.0), (2, 0, 8.0),
             (0, 1, 2.0), (4, 0, 16.0)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    dual = {
        r["id"]: (r["rank"], r["rank_w"])
        for r in pagerank_dual(df, 8, 0.5, weight_col="w").collect()
    }
    ru = {r["id"]: r["rank"] for r in pagerank(df, 8, 0.5).collect()}
    rw = {
        r["id"]: r["rank"]
        for r in pagerank(df, 8, 0.5, weight_col="w").collect()
    }
    assert set(dual) == set(ru)
    assert {k: v[0] for k, v in dual.items()} == ru
    assert {k: v[1] for k, v in dual.items()} == rw

    # node 9's only out-edge has w=0: unweighted keeps the edge, the
    # weighted single variant drops node 10... (only reachable via it)
    mixed = edges + [(9, 10, 0.0)]
    df2 = spark.createDataFrame(mixed, "src bigint, dst bigint, w double")
    dual2 = {
        r["id"]: (r["rank"], r["rank_w"])
        for r in pagerank_dual(df2, 8, 0.5, weight_col="w").collect()
    }
    ru2 = {r["id"]: r["rank"] for r in pagerank(df2, 8, 0.5).collect()}
    rw2 = {
        r["id"]: r["rank"]
        for r in pagerank(df2, 8, 0.5, weight_col="w").collect()
    }
    assert {k: v[0] for k, v in dual2.items()} == ru2  # union node set
    for k, v in rw2.items():  # every weighted-variant node agrees
        assert dual2[k][1] == v
    # the extra nodes sit at the (1-d) baseline in rank_w
    for k in set(dual2) - set(rw2):
        assert dual2[k][1] == 0.5


def test_host_rank_weights_endorsement_strength(spark):
    """host_rank is weighted: many distinct URL edges from one host
    concentrate its endorsement on the heavier target."""
    edges = (
        [(f"https://hub.test/p{i}", "https://heavy.test/") for i in range(7)]
        + [("https://hub.test/p0", "https://light.test/")]
        # give both targets an identical second endorser so only the
        # hub's split differentiates them
        + [("https://other.test/a", "https://heavy.test/"),
           ("https://other.test/a", "https://light.test/")]
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    s = {r["host"]: r["score"] for r in host_rank(df, 8, 0.5).collect()}
    assert s["heavy.test"] > s["light.test"]


def test_host_quality_scores_rank_usable_hosts(spark):
    """Hosts whose documents pass the quality gates score higher; the
    aggregate is host-keyed with no corpus join (plan has no
    SortMergeJoin/BroadcastHashJoin) and partial-aggregates map-side."""
    from img_spark.operators.linkgraph import host_quality_scores

    good = ("a solid paragraph of useful prose with enough words to "
            "pass every gopher gate comfortably and naturally")
    docs = [
        (f"g{i}", "good.test", good) for i in range(4)
    ] + [
        ("b0", "junk.test", "x"),                    # too few tokens
        ("b1", "junk.test", good),                   # one usable doc
        ("m0", "mixed.test", good),
        ("m1", "mixed.test", "zzzzzzzzzzzz"),        # 1 token
    ]
    df = spark.createDataFrame(docs, "doc_id string, host string, text string")
    out = host_quality_scores(df)
    got = {r["host"]: (r["score"], r["n_docs"]) for r in out.collect()}
    assert got["good.test"] == (1.0, 4)
    assert got["junk.test"] == (0.5, 2)
    assert got["mixed.test"] == (0.5, 2)
    # scheduler contract: (host, score) plugs straight into
    # Crawler(host_scores=...)
    assert {"host", "score"} <= set(out.columns)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "partial_" in plan


def test_dispatch_global_cap_composes_with_salted_dispatch(spark):
    """The fleet cap composes with the skew-safe two-phase dispatch:
    identical dispatch set to the unsalted path (salting never changes
    WHO wins), rest rows stay held."""
    from img_spark.operators.politeness import (
        dispatch_global_cap,
        dispatch_top_k,
        dispatch_top_k_salted,
    )

    rows = [
        (f"https://h{h}.test/p{i}", f"h{h}.test", 1, f"{i:08x}", float(h))
        for h in range(5)
        for i in range(6)
    ]
    pending = spark.createDataFrame(
        rows, "url string, host string, depth int, path string,"
        " host_score double",
    ).withColumn("crawl_delay", F.lit(0.0))
    plain = dispatch_global_cap(
        dispatch_top_k(pending, 2, order="score", score="host_score"),
        4, order="score", score="host_score",
    )
    salted = dispatch_global_cap(
        dispatch_top_k_salted(
            pending, 2, order="score", score="host_score", salts=4
        ),
        4, order="score", score="host_score",
    )
    a = sorted(r["url"] for r in plain.filter("dispatch").collect())
    b = sorted(r["url"] for r in salted.filter("dispatch").collect())
    assert a == b and len(a) == 4
    assert salted.count() == len(rows)


def test_job_rank_hosts_flag(spark, tmp_path, capsys):
    """job.py --resume --rank-hosts: the checkpoint's own link graph
    is ranked into host scores on resume (self-prioritizing recrawl);
    guards refuse --rank-hosts without --resume or combined with an
    explicit --host-scores table."""
    import json as _json

    import job
    from img_spark.sources.synthweb import PAGES_DDL

    # a CROSS-host web (host_graph drops intra-host edges, so the
    # standard fixture — whose links are all within one site — ranks
    # zero hosts): xa.test's album links endorse xb.test
    index = (
        b"<html><head><title>XA Index</title></head><body>"
        b'<div class="alb">'
        b'<a href="https://xb.test/p1" title="P1">one</a>'
        b"</div></body></html>"
    )
    photo = (
        b"<html><head><title>XB photo</title></head><body>"
        b'<div class="photo"><img src="/i1.jpg"></div></body></html>'
    )
    rows = [
        ("https://xa.test/", None, index, None, None),
        ("https://xb.test/p1", None, photo, None, None),
    ]
    pages_path = str(tmp_path / "pages")
    spark.createDataFrame(rows, PAGES_DDL).write.parquet(pages_path)
    cfg_json = str(tmp_path / "web.json")
    with open(cfg_json, "w") as f:
        _json.dump([
            {"Site": "xa.test", "Img": "div.photo img",
             "Album": "div.alb a"},
            {"Site": "xb.test", "Img": "div.photo img"},
        ], f)
    ckpt = str(tmp_path / "ckpt")
    base = [
        "--pages", pages_path, "--checkpoint", ckpt,
        "--config", cfg_json, "--partitions", "4",
    ]
    assert job.main(base + ["--seeds", "https://xa.test/"]) == 0
    capsys.readouterr()

    rc = job.main(base + [
        "--resume", "--rank-hosts",
        "--priority", "score", "--priority-score", "host_score",
        "--max-generations", "1",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    ranked = [
        _json.loads(line) for line in out.splitlines()
        if '"ranked_hosts"' in line
    ]
    assert ranked and ranked[0]["ranked_hosts"] == 2  # xa + xb

    with pytest.raises(SystemExit, match="--resume"):
        job.main(base + ["--seeds", "https://xa.test/", "--rank-hosts"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        job.main(base + ["--resume", "--rank-hosts",
                         "--host-scores", str(tmp_path / "nope")])
