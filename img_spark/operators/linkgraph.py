"""Link-graph analysis for frontier prioritization.

A production crawl scheduler ranks its frontier by more than depth:
the link graph the crawl itself discovers is the standard importance
signal (PageRank / OPIC-family scoring — Abiteboul et al., "Adaptive
On-Line Page Importance Computation", WWW'03; Page et al. 1999). The
reference CLI crawls depth-first with no scoring (main.rs drives
`website()` recursion); this module is the engine extension that makes
`CrawlConfig.priority_score` a *learned* order: edges come out of the
crawl checkpoint (`link_edges`), ranks come out of `pagerank` /
`host_rank`, and the scores feed back into dispatch via
``CrawlConfig.host_scores`` (broadcast-joined, same shape as
``host_budgets``).

Scale shape (the part that matters at 10^10 edges):

- ``pagerank`` is the GraphX ``staticPageRank`` formulation: rank is
  UNNORMALIZED (init 1.0, reset (1-d), dangling mass dropped) so no
  global normalization pass is needed, and each iteration is exactly
  (a) one edge-sized shuffle join of ranks onto edges' src and (b)
  one map-side-combinable sum onto dst. Contributions divide by
  out-degree, precomputed ONCE and carried on the edge row — the
  per-iteration join touches only (src, dst, inv_deg) x (src, rank).
- Iterations are a fixed small count (the web graph needs ~10 for
  ordering stability); lineage is truncated with localCheckpoint
  every few iterations so Catalyst analysis stays O(1) per iteration
  instead of O(iteration-depth) — the same hazard the frontier loop's
  plan hoisting solves.
- ``host_rank`` first collapses the URL graph to the HOST graph
  (groupBy edge endpoints' hosts — map-combinable, typically 3-4
  orders of magnitude smaller), then ranks hosts. Host count is
  small enough that the rank table broadcast-joins onto dispatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 4,
    materialize: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Unnormalized PageRank over a directed edge list → (id, rank).

    GraphX-staticPageRank semantics: every node starts at rank 1.0;
    each iteration sets ``rank(v) = (1-d) + d * Σ_{u→v} rank(u) /
    outdeg(u)``. Dangling nodes (no out-edges) contribute nothing —
    ranks no longer sum to N, which is irrelevant for ORDERING a
    frontier (and saves the global dangling-mass aggregate a
    normalized formulation needs every iteration). Duplicate edges
    are collapsed; self-loops participate normally.

    ``weight_col``: WEIGHTED variant — each edge carries
    ``w / Σ w(src)`` of its source's rank instead of an equal
    ``1/outdeg`` share (duplicate (src, dst) rows sum their weights).
    ``host_graph``'s distinct-URL-edge counts feed this: fifty links
    from a.test to b.test endorse b.test more than one link does.

    Deterministic given deterministic input: the only float work is
    a sum whose addends are fixed — with dyadic damping/degrees (the
    oracle harness uses d=0.5 and power-of-two out-degrees) the sums
    are EXACT and order-independent, so results are bit-identical
    across partitionings and engines."""
    if weight_col is not None:
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .groupBy("src", "dst").agg(F.sum("w").alias("w"))
            # w<=0 / NULL edges carry no endorsement — drop them
            # EXPLICITLY (a src whose weights sum to 0 would otherwise
            # divide 0/0 into NULL shares and silently vanish from the
            # graph; dropping makes it a dangling node, the same
            # treatment a src with no edges gets)
            .filter(F.col("w") > 0)
        )
        tot = e.groupBy("src").agg(F.sum("w").alias("tot"))
        ed = e.join(tot, "src").select(
            "src", "dst", (F.col("w") / F.col("tot")).alias("inv_deg")
        ).persist()
    else:
        e = (
            edges.select(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
            )
            .distinct()
        )
        deg = e.groupBy("src").agg((1.0 / F.count("*")).alias("inv_deg"))
        # inv_deg rides the edge row: the per-iteration join carries
        # three columns, and the division is pre-folded into one
        # multiply
        ed = e.join(deg, "src").persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    reset = F.lit(1.0 - damping)
    for i in range(iterations):
        contribs = (
            ed.join(
                ranks.select(F.col("id").alias("src"), "rank"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("inv_deg")).alias("c"))
        )
        ranks = nodes.join(contribs, "id", "left").select(
            "id",
            (reset + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0)))
            .alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # truncate lineage: an iterative DataFrame loop otherwise
            # re-analyzes a plan that doubles per iteration
            ranks = ranks.localCheckpoint(eager=True)
    if materialize:
        # materialize the final ranks and RELEASE the loop's caches —
        # without this every pagerank() call leaks two persisted
        # DataFrames for the session's lifetime (the caller has no
        # handle to unpersist them). materialize=False keeps the lazy
        # plan (callers that inspect it, or will persist the result
        # themselves) but then owns recomputation cost on action.
        ranks = ranks.localCheckpoint(eager=True)
    ed.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_dual(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Both ``pagerank`` variants — unweighted AND weighted — in ONE
    iteration loop → (id, rank, rank_w). Value-identical to running
    ``pagerank(e)`` and ``pagerank(e, weight_col=...)`` separately
    (pinned in tests/test_linkgraph.py): both variants walk the same
    (src, dst) topology, so each per-iteration edge join and
    map-combinable sum can carry BOTH shares on one edge row — half
    the iterative joins, half the lineage checkpoints, one node
    frame. Built for callers that need both rankings of one graph
    (the oracle-harness fingerprint row runs exactly that); the
    arithmetic per variant is unchanged, so the dyadic-exactness
    guarantee of ``pagerank`` carries over.

    Edge semantics match the separate calls: the unweighted share
    divides by the DISTINCT out-edge count including w<=0 edges; the
    weighted share drops w<=0/NULL edges (their ``inv_w`` is NULL and
    ``sum()`` skips NULL terms — the same no-endorsement treatment).
    One deliberate difference: the output node set is the UNION graph's
    (a node whose edges all have w<=0 still gets its (1-d) baseline
    ``rank_w`` instead of vanishing), which is the consistent node set
    the weighted variant's doc warns about."""
    raw = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    )
    we = raw.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    tot = we.groupBy("src").agg(
        F.sum(F.when(F.col("w") > 0, F.col("w"))).alias("tot"),
        F.count("*").alias("deg"),
    )
    ed = we.join(tot, "src").select(
        "src",
        "dst",
        (1.0 / F.col("deg")).alias("inv_u"),
        F.when(F.col("w") > 0, F.col("w") / F.col("tot")).alias("inv_w"),
    ).persist()
    nodes = (
        ed.select(F.col("src").alias("id"))
        .unionByName(ed.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    reset = F.lit(1.0 - damping)
    # a node with NO in-edges gets zero contribution in EVERY
    # iteration — its rank is the reset constant from the first update
    # on. Precomputing those rows once and UNIONING them in replaces
    # the per-iteration nodes-LEFT-JOIN (one broadcast build + join
    # stage per iteration) with a free partition concat; every dst
    # node receives a contribs row every iteration (all ranks > 0,
    # every edge joins), so contribs ∪ baseline is exactly the node
    # set. Values are untouched: coalesce() still maps an
    # all-NULL-inv_w sum to the same 0.0 the left join produced.
    baseline = nodes.join(
        ed.select(F.col("dst").alias("id")).distinct(), "id", "left_anti"
    ).select(
        "id", reset.alias("rank"), reset.alias("rank_w")
    ).persist()
    ranks = nodes.select(
        "id", F.lit(1.0).alias("rank"), F.lit(1.0).alias("rank_w")
    )
    for i in range(iterations):
        contribs = (
            ed.join(
                ranks.select(
                    F.col("id").alias("src"), "rank", "rank_w"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum(F.col("rank") * F.col("inv_u")).alias("cu"),
                F.sum(F.col("rank_w") * F.col("inv_w")).alias("cw"),
            )
        )
        ranks = contribs.select(
            "id",
            (reset + F.lit(damping) * F.coalesce(F.col("cu"), F.lit(0.0)))
            .alias("rank"),
            (reset + F.lit(damping) * F.coalesce(F.col("cw"), F.lit(0.0)))
            .alias("rank_w"),
        ).unionByName(baseline)
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    ranks = ranks.localCheckpoint(eager=True)
    ed.unpersist()
    nodes.unpersist()
    baseline.unpersist()
    return ranks


def host_graph(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Collapse a URL-level edge list to the weighted HOST graph:
    (src_host, dst_host, weight = distinct URL-edge count), intra-host
    edges dropped (they say nothing about cross-site endorsement).
    Map-combinable groupBy — the URL graph never shuffles whole."""
    from img_spark.operators.urlexprs import host_of

    return (
        # DISTINCT url edges first — the promised weight semantics; a
        # raw multi-generation frontier dump re-discovers the same
        # link many times, and re-discovery multiplicity must not
        # inflate endorsement
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .distinct()
        .select(
            host_of(F.col("u")).alias("src_host"),
            host_of(F.col("v")).alias("dst_host"),
        )
        .filter(
            F.col("src_host").isNotNull()
            & F.col("dst_host").isNotNull()
            & (F.col("src_host") != F.col("dst_host"))
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("weight"))
    )


def host_rank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """WEIGHTED PageRank over the host graph → (host, score): a
    source host's endorsement splits across its targets in proportion
    to how many distinct URL edges point at each. The host table is
    small (10^7 hosts vs 10^10 URLs) — the result broadcast-joins
    onto dispatch as ``CrawlConfig.host_scores``."""
    hg = host_graph(edges, src_col=src_col, dst_col=dst_col)
    return pagerank(
        hg, iterations=iterations, damping=damping,
        src_col="src_host", dst_col="dst_host", weight_col="weight",
    ).select(F.col("id").alias("host"), F.col("rank").alias("score"))


def link_edges(spark, checkpoint_dir: str) -> DataFrame:
    """(src, dst) URL edges discovered by a crawl: every frontier row
    enqueued with a parent (albums, next-links, redirect re-admissions
    — any kind) is one edge parent_url → url. Reads the frontier
    deltas through ``read_frontier`` (manifest-bounded, terminal +
    pending alike: an edge is evidence of linkage whatever the fetch
    later did). Seeds have no parent and contribute no edge."""
    from img_spark.plans.crawl import read_frontier

    latest = None
    from img_spark import fsio

    for fn in fsio.listdir(checkpoint_dir):
        if fn.startswith("manifest-g") and fn.endswith(".json"):
            g = int(fn[len("manifest-g"):-len(".json")])
            latest = g if latest is None else max(latest, g)
    if latest is None:
        raise FileNotFoundError(f"no committed manifest under {checkpoint_dir}")
    return (
        read_frontier(spark, checkpoint_dir, latest)
        .filter(F.col("parent_url").isNotNull())
        .select(F.col("parent_url").alias("src"), F.col("url").alias("dst"))
        .distinct()
    )


def host_quality_scores(
    docs: DataFrame, host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """Quality-prior host scores for the scheduler: (host, score,
    n_docs) where score is the fraction of the host's documents
    passing the Gopher-style quality gates
    (operators/textquality.quality_signals ``keep``). Feeds
    ``Crawler(host_scores=...)`` directly — a continuous crawl can
    rank its next batch by where the USABLE text came from, closing
    the loop between curation and scheduling (link_rank measures
    endorsement; this measures yield — combine them in a
    priority_score expression).

    Scale shape: the host rides through as the signals frame's id
    column, so the whole thing is one map-combinable aggregate over
    the corpus — no join, no corpus-sized shuffle (the output is
    host-cardinality)."""
    from img_spark.operators.textquality import quality_signals

    sig = quality_signals(
        docs.select(
            F.col(host_col).alias("doc_id"), F.col(text_col)
        ),
        text_col=text_col,
    )
    return (
        sig.groupBy("doc_id")
        .agg(
            # NULL keep (NULL-text doc) counts as NOT passing — avg()
            # would skip it and rank a 9-NULLs-1-pass host at 1.0
            F.avg(
                F.coalesce(F.col("keep"), F.lit(False)).cast("double")
            ).alias("score"),
            F.count("*").alias("n_docs"),
        )
        .withColumnRenamed("doc_id", "host")
    )
