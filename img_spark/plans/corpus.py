"""Crawl checkpoint → curated training corpus (the end-to-end story:
the same engine that crawls the pages also prepares them for training).

``build_corpus`` reads the crawl's extracted deltas (the per-generation
parquet the loop already writes — no re-crawl, no re-parse), reduces
them to one document per fetched page, and runs the training-data
operators over them in the composition a 100-TB pipeline ships:
quality gates → language ID → exact dedup → (optional) benchmark
decontamination → deterministic stratified sampling, every flag kept
so drops are auditable, written lang-partitioned.

Scale shape: quality/lang/token counts are ONE projection pass (pure
JVM expressions); exact dedup is the fingerprint window (one shuffle
on the fingerprint — at corpus scale the natural key to co-partition
by); decontamination broadcasts the benchmark gram set; sampling is a
pure hash projection (zero shuffle); the write partitions by lang.
Nothing here collects to the driver except the final summary counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from img_spark import fsio


def crawl_documents(
    spark: SparkSession, checkpoint_dir: str
) -> DataFrame:
    """One row per successfully fetched page across every generation
    of a crawl checkpoint: (doc_id=page_url, host, title, text,
    generation). Reads only the extracted deltas (each generation's
    pages appear exactly once — the seen-set guarantees a URL is
    fetched once), pruning to the page-level columns so the img rows'
    fan-out collapses map-side."""
    base = fsio.join(checkpoint_dir, "extracted")
    gens = sorted(
        int(fn[1:]) for fn in fsio.listdir(base)
        if fn.startswith("g") and fn[1:].isdigit()
    )
    # bound by the newest COMMITTED manifest: an in-flight or crashed
    # generation may have written a partial extracted/g{n} dir before
    # its manifest landed — reading it would corrupt the corpus
    # silently. Checkpoints without manifests (hand-built test inputs)
    # are taken as-is.
    committed = [
        int(fn[len("manifest-g"):-len(".json")])
        for fn in fsio.listdir(checkpoint_dir)
        if fn.startswith("manifest-g") and fn.endswith(".json")
    ]
    if committed:
        gmax = max(committed)
        gens = [g for g in gens if g <= gmax]
    if not gens:
        raise FileNotFoundError(f"no committed extracted deltas under {base}")
    df = spark.read.parquet(*[fsio.join(base, f"g{g}") for g in gens])
    # every parse status except the miss marker carries page text
    # (ok | no_title | empty | bad_host); empty/low-quality pages are
    # the quality gates' job, not this reader's
    return (
        df.filter(F.col("status") != "fetch_failed")
        .groupBy("page_url")
        .agg(
            F.first("host").alias("host"),
            F.first("title").alias("title"),
            F.first("extracted_text").alias("text"),
            F.min("generation").alias("generation"),
        )
        .select(
            F.col("page_url").alias("doc_id"),
            "host", "title", "text", "generation",
        )
    )


def pages_documents(pages: DataFrame) -> DataFrame:
    """A (url, warc_ts, html, text, lang) pages table → corpus
    documents — the no-crawl entry: Common-Crawl WARC/WET input
    (``job.py --materialize-pages`` / ``read_warc_pages`` + WET text
    join) can feed ``build_corpus`` directly. Revisit duplicates
    collapse to the lexicographically-max text per url (the WET-join
    policy); html is pruned immediately so the binary column never
    travels past the scan."""
    from img_spark.operators.urlexprs import host_of

    return (
        pages.select("url", "text")
        .groupBy("url")
        .agg(F.max("text").alias("text"))
        .select(
            F.col("url").alias("doc_id"),
            host_of(F.col("url")).alias("host"),
            F.lit(None).cast("string").alias("title"),
            "text",
            F.lit(0).alias("generation"),
        )
    )


def build_corpus(
    spark: SparkSession,
    checkpoint_dir: str | None,
    out_dir: str,
    sample_rates: dict | None = None,
    default_rate: float = 1.0,
    benchmark: DataFrame | None = None,
    near_dup_threshold: float | None = None,
    near_dup_max_bucket: int | None = 10_000,
    documents: DataFrame | None = None,
) -> dict:
    """Materialize the curated corpus for a finished (or in-flight)
    crawl. Writes lang-partitioned parquet rows
    (doc_id, host, title, text, generation, n_tokens, n_chars,
    quality_keep, is_dup, is_near_dup, contaminated, sampled, keep)
    and returns summary counts. ``sample_rates`` maps language → keep
    rate for the deterministic stratified sampler (corpus mixing);
    ``benchmark`` is an optional (doc_id, text) eval set for n-gram
    decontamination; ``near_dup_threshold`` (e.g. 0.8) additionally
    runs MinHash-LSH → exact-Jaccard → connected components and drops
    every non-representative member of a near-dup cluster (min doc_id
    survives — the standard fuzzy-dedup policy; ``near_dup_max_bucket``
    caps hot LSH buckets so one boilerplate shingle can't go
    quadratic)."""
    from pyspark import StorageLevel

    from img_spark.operators.textquality import (
        curation_flags,
        lang_id,
        stratified_sample,
        token_count,
    )

    # source: a crawl checkpoint's extracted deltas, or any documents
    # DataFrame (doc_id, host, title, text, generation) — e.g.
    # ``pages_documents`` over a WARC/WET-derived pages table
    if documents is not None:
        docs = documents
    elif checkpoint_dir is not None:
        docs = crawl_documents(spark, checkpoint_dir)
    else:
        raise ValueError("build_corpus needs checkpoint_dir or documents")
    # docs feeds ~6 consumers (projection, quality, dedup, optional
    # decontamination, minhash bands + gram arrays) — without the
    # persist each would re-read every extracted delta and re-run the
    # per-page groupBy: ~6 full corpus scans instead of one
    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    # quality + lang + tokens: one projection pass over the documents
    base = docs.withColumns({
        "lang": lang_id(F.col("text")),
        "n_tokens": token_count(F.col("text")),
        "n_chars": F.length("text"),
    })
    # the shared curation core (ONE implementation with the
    # driver-checked curate_corpus gate): quality ∧ ¬dup ∧ ¬contaminated
    out = base.join(curation_flags(docs, benchmark), "doc_id")
    comps = None
    if near_dup_threshold is not None:
        from img_spark.operators.dedup import (
            connected_components,
            minhash_dedup,
        )

        pairs = minhash_dedup(
            docs, threshold=near_dup_threshold,
            max_bucket=near_dup_max_bucket,
        )
        comps = connected_components(pairs)
        near = comps.filter(F.col("doc_id") != F.col("rep_id")).select(
            "doc_id", F.lit(True).alias("is_near_dup")
        )
        out = out.join(near, "doc_id", "left").na.fill(
            {"is_near_dup": False}
        )
    else:
        out = out.withColumn("is_near_dup", F.lit(False))
    sampled = stratified_sample(
        base.select("doc_id", "lang"),
        rates=sample_rates or {},
        default_rate=default_rate,
        strat_col="lang",
    ).select("doc_id", "sampled")
    out = out.join(sampled, "doc_id").withColumn(
        "keep",
        F.col("quality_keep") & ~F.col("is_dup") & ~F.col("is_near_dup")
        & ~F.col("contaminated") & F.col("sampled"),
    )

    from pyspark.sql import Observation

    obs = Observation("corpus")
    out = out.observe(
        obs,
        F.count("*").alias("documents"),
        F.count(F.when(F.col("keep"), 1)).alias("kept"),
        F.count(F.when(F.col("is_dup"), 1)).alias("dups"),
        F.count(F.when(F.col("is_near_dup"), 1)).alias("near_dups"),
        F.count(F.when(~F.col("quality_keep"), 1)).alias("quality_dropped"),
        F.count(F.when(F.col("contaminated"), 1)).alias("contaminated"),
        F.count(F.when(~F.col("sampled"), 1)).alias("sampled_out"),
    )
    out.write.mode("overwrite").partitionBy("lang").parquet(out_dir)
    docs.unpersist()
    if comps is not None:
        comps.unpersist()  # connected_components returns it persisted
    return {k: int(v) for k, v in obs.get.items()}
