#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north_rule lifecycle,
SURVEY.md §3.4):

    zip -r engine.zip img_spark
    spark-submit --master <cluster> --py-files engine.zip job.py \
        --seeds https://a.example/ https://b.example/ \
        --pages /data/pages            # parquet dir / Iceberg table id \
        --checkpoint s3://bucket/crawl-1 \
        --config web.json              # reference-shaped site config \
        --robots-rules /data/robots.parquet \
        --host-budget 64 --partitions 4096 --pages-buckets 1024

The master comes from spark-submit (never overridden here); every other
runtime default is the engine's (img_spark.plans.session). One JSON
status line per generation on stdout; the final line carries
``"done": true`` and the cumulative frontier-status totals. ``--resume``
continues from the newest committed manifest in the checkpoint dir.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="img-spark crawl job")
    p.add_argument("--seeds", nargs="*", default=[],
                   help="seed URLs (required unless --resume or "
                        "--seeds-from-sitemaps)")
    p.add_argument("--seeds-from-sitemaps", nargs="*", default=[],
                   metavar="SITEMAP_URL",
                   help="bootstrap the frontier from sitemaps: fetch "
                        "these sitemap URLs (following <sitemapindex> "
                        "indirections), union the page URLs into "
                        "--seeds")
    p.add_argument("--seeds-from-robots", nargs="*", default=[],
                   metavar="HOST",
                   help="discover sitemap entry points from these "
                        "hosts' robots.txt Sitemap: lines and union "
                        "them into --seeds-from-sitemaps (frontier "
                        "bootstrap from nothing but a host list)")
    p.add_argument("--pages", default=None,
                   help="pages table: parquet path, Iceberg identifier, "
                        "or WARC file/glob (required unless "
                        "--fetch-mode http)")
    p.add_argument("--fetch-mode", default="table",
                   choices=("table", "http"),
                   help="http: live pooled-HTTP fetch of the dispatch "
                        "batch (operators/fetch.py) instead of the "
                        "pages-table join; robots.txt is fetched "
                        "lazily per host — seeds and hosts discovered "
                        "mid-crawl — and persisted under the "
                        "checkpoint, unless --robots-rules/"
                        "--robots-bodies is given")
    p.add_argument("--connect-to", default=None,
                   help="scheme://host[:port] connection override for "
                        "--fetch-mode http (curl --resolve pattern; "
                        "tests/canaries)")
    p.add_argument("--media-dir", default=None,
                   help="--fetch-mode http: download each generation's "
                        "extracted media URLs (robots-checked, paced, "
                        "deduplicated across generations) and archive "
                        "the bytes as WARC under DIR/g{g}/ — the "
                        "reference's download() stage")
    p.add_argument("--archive-dir", default=None,
                   help="archive each generation's fetched bodies as "
                        "WARC under DIR/g{g}/ (both fetch modes; "
                        "re-processable crawl output, the layout the "
                        "WARC source reads)")
    p.add_argument("--pages-format", default="auto",
                   choices=("auto", "table", "warc"),
                   help="auto: WARC when the path looks like *.warc[.gz]")
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir (any pyarrow.fs scheme)")
    p.add_argument("--config", default=None,
                   help="web.json-shaped site-config file")
    p.add_argument("--robots-rules", default=None,
                   help="parquet of (host, path_prefix, allow, crawl_delay); "
                        "these hosts are authoritative — in http mode, "
                        "hosts NOT in the table still get live robots.txt "
                        "fetches unless --no-live-robots")
    p.add_argument("--robots-bodies", default=None,
                   help="parquet of (host, body) raw robots.txt bodies; "
                        "same authority semantics as --robots-rules")
    p.add_argument("--no-live-robots", action="store_true",
                   help="--fetch-mode http: disable lazy robots.txt "
                        "fetching entirely — hosts without static rules "
                        "are admitted allow-all (hermetic runs only)")
    p.add_argument("--agent", default="imgbot",
                   help="user-agent for robots group selection")
    p.add_argument("--http-retries", type=int, default=1,
                   help="--fetch-mode http: retries per request on "
                        "transient failures (transport error / 5xx); "
                        "0 = single-attempt curl parity")
    p.add_argument("--redirect-policy", choices=("follow", "strict"),
                   default="follow",
                   help="--fetch-mode http cross-host 3xx: 'follow' = "
                        "inline (curl -L reference parity), 'strict' = "
                        "re-enqueue the target through robots admission "
                        "+ the seen-set instead of fetching it")
    p.add_argument("--robots-ttl", type=float, default=86400.0,
                   help="--fetch-mode http: re-fetch a host's live "
                        "robots.txt when its stored rules are older "
                        "than this many seconds")
    p.add_argument("--revisit-after", type=float, default=0.0,
                   help="--fetch-mode http: >0 turns the one-shot "
                        "frontier into a continuous crawler — fetched "
                        "URLs older than this many seconds re-enqueue "
                        "for revisit and refetch CONDITIONALLY "
                        "(If-None-Match/If-Modified-Since from the "
                        "stored validators; 304 = zero body bytes, "
                        "status 'unmodified'). POLITENESS.md")
    p.add_argument("--revisit-every", type=int, default=1,
                   help="with --revisit-after: run the revisit sweep "
                        "(an O(validators-store) job) every N "
                        "generations instead of every step")
    p.add_argument("--revisit-min", type=float, default=0.0,
                   help="with --revisit-after: ADAPTIVE per-URL "
                        "recrawl intervals (AIMD) — a 304 doubles a "
                        "URL's interval up to --revisit-max, changed "
                        "content halves it down to this floor; 0 = "
                        "fixed cadence at --revisit-after")
    p.add_argument("--revisit-max", type=float, default=0.0,
                   help="interval cap for --revisit-min (0 = fixed "
                        "cadence)")
    p.add_argument("--revisit-poll", type=float, default=0.0,
                   help="with --revisit-after: when the frontier "
                        "drains, sleep this many seconds and keep "
                        "stepping (continuous operation, bounded by "
                        "--max-generations) instead of exiting; 0 = "
                        "exit when drained (default)")
    p.add_argument("--host-budget", type=int, default=1)
    p.add_argument("--global-budget", type=int, default=0,
                   help=">0: cap the whole generation's dispatch at N "
                        "URLs across all hosts, highest priority first "
                        "(fetch-fleet batch capacity)")
    p.add_argument("--partitions", type=int, default=32,
                   help="seen-set salt shards / state write width")
    p.add_argument("--pages-buckets", type=int, default=0,
                   help=">0: pages table carries url_bucket for scan pruning")
    p.add_argument("--max-generations", type=int, default=10_000)
    p.add_argument("--priority", choices=("dfs", "bfs", "score"),
                   default="dfs")
    p.add_argument("--priority-score", default=None,
                   help="SQL expression over frontier rows for "
                        "--priority score (highest dispatched first); "
                        "use = syntax for leading-dash expressions, "
                        "e.g. --priority-score=-depth")
    p.add_argument("--host-budgets", default=None,
                   help="parquet of (host, budget) per-host overrides")
    p.add_argument("--host-scores", default=None,
                   help="parquet of (host, score) priority table, "
                        "joined onto pending as host_score for "
                        "--priority-score expressions")
    p.add_argument("--rank-hosts", action="store_true",
                   help="with --resume: compute (host, score) by "
                        "PageRank over the link graph the checkpoint "
                        "has discovered so far and use it as the "
                        "host-score table (self-prioritizing recrawl; "
                        "combine with --priority score "
                        "--priority-score host_score)")
    p.add_argument("--album-policy", default="all")
    p.add_argument("--seen-mode", choices=("cuckoo", "exact"), default="cuckoo")
    p.add_argument("--cuckoo-capacity", type=int, default=1 << 16)
    p.add_argument("--dispatch-salts", type=int, default=0)
    p.add_argument("--backoff-failures", type=int, default=0,
                   help=">0: a host with this many fetch failures in "
                        "the previous generation is skipped for one "
                        "generation (per-host circuit breaker)")
    p.add_argument("--compact-every", type=int, default=0)
    p.add_argument("--main-text", action="store_true",
                   help="also compute readability-lite main content "
                        "(boilerplate-removed text) per fetched page "
                        "into the extracted deltas' main_text column — "
                        "enables --curate-text main")
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest committed manifest")
    p.add_argument("--curate", default=None, metavar="OUT",
                   help="after the crawl: build the curated training "
                        "corpus from the extracted deltas (quality "
                        "gates, language ID, exact dedup, stratified "
                        "sampling) and write it lang-partitioned to "
                        "OUT (plans/corpus.build_corpus)")
    p.add_argument("--media-corpus", default=None, metavar="OUT",
                   help="after the crawl: write the image-text-pair "
                        "table (media_url, caption, page metadata, and "
                        "the archived bytes when --media-dir was used) "
                        "to OUT as parquet "
                        "(plans/corpus.media_documents)")
    p.add_argument("--curate-rates", default=None,
                   help="lang=rate[,lang=rate...] stratified sampling "
                        "rates for --curate (default rate 1.0)")
    p.add_argument("--curate-near-dup", type=float, default=None,
                   metavar="THRESHOLD",
                   help="with --curate: also drop MinHash near-dups "
                        "at this Jaccard threshold (e.g. 0.8; "
                        "LSH -> verify -> connected components)")
    p.add_argument("--curate-versioned", action="store_true",
                   help="with --curate: publish the corpus through the "
                        "versioned layout (OUT/corpus_v{N} + atomic "
                        "CURRENT pointer — rewrites never leave a "
                        "partial/absent corpus; readers resolve the "
                        "pointer via plans.corpus.resolve_corpus). An "
                        "OUT that already carries a pointer stays "
                        "versioned without the flag")
    p.add_argument("--curate-text", choices=("full", "main"),
                   default=None,
                   help="with --curate: which extracted text feeds the "
                        "corpus — 'full' = all visible text (WET-"
                        "style), 'main' = readability-lite main "
                        "content (requires --main-text on the crawl "
                        "that wrote the checkpoint). Incremental "
                        "re-curation inherits and enforces the stored "
                        "choice")
    p.add_argument("--curate-from-pages", action="store_true",
                   help="with --curate: build the corpus directly "
                        "from the --pages input's text column "
                        "(WARC/WET or parquet) and exit — no crawl, "
                        "no --seeds needed")
    p.add_argument("--wet", default=None,
                   help="WET sidecar file/glob: fills the pages text "
                        "column by url join (Common Crawl's extracted-"
                        "text archives)")
    p.add_argument("--materialize-pages", default=None, metavar="OUT",
                   help="one-shot ETL: read the pages input (table or "
                        "WARC, --wet honored), write it bucket-"
                        "partitioned to OUT for --pages-buckets scan "
                        "pruning, print a JSON summary, and exit "
                        "(no crawl; --seeds not required)")
    return p


def _sample_rates(spec: str | None) -> dict:
    rates = {}
    if spec:
        for part in spec.split(","):
            part = part.strip()
            if not part:
                continue  # tolerate a trailing comma
            k, sep, v = part.partition("=")
            try:
                if not sep:
                    raise ValueError
                rates[k.strip()] = float(v)
            except ValueError:
                # fail at argument time with a usable message, not
                # with a raw float('') traceback after an hours-long
                # crawl has already finished
                raise SystemExit(
                    f"error: bad --curate-rates entry {part!r} "
                    "(expected lang=rate, e.g. en=0.5)"
                )
    return rates


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    curate_only = bool(args.curate and args.curate_from_pages)
    if (
        not args.resume and not args.seeds
        and not args.seeds_from_sitemaps and not args.seeds_from_robots
        and not args.materialize_pages and not curate_only
    ):
        print("error: --seeds required unless --resume", file=sys.stderr)
        return 2
    if curate_only and args.pages is None:
        print("error: --curate-from-pages requires --pages",
              file=sys.stderr)
        return 2
    if args.curate_from_pages and not args.curate:
        # without this, the flag would silently fall through to a
        # full crawl — the opposite of the no-crawl it promises
        print("error: --curate-from-pages requires --curate OUT",
              file=sys.stderr)
        return 2
    if args.pages is None and args.fetch_mode != "http":
        print("error: --pages required unless --fetch-mode http",
              file=sys.stderr)
        return 2
    if args.materialize_pages and args.pages is None:
        print("error: --materialize-pages requires --pages",
              file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from img_spark.plans.crawl import CrawlConfig, Crawler
    from img_spark.plans.session import engine_defaults
    from img_spark.operators.politeness import (
        robots_df,
        robots_rules_from_bodies,
    )
    from img_spark.sources.site_config import load_site_config_rows
    from img_spark.sources.tables import read_pages, read_pages_bucketed

    spark = engine_defaults(
        SparkSession.builder.appName("img-spark-crawl"),
        shuffle_partitions=args.partitions,
    ).getOrCreate()

    if args.seeds_from_robots:
        # known cost: this discovery GET of each host's robots.txt is
        # separate from the crawler's lazy rules fetch at init (one
        # extra request per seed host, once per cold start) — fusing
        # them would couple seed discovery to the checkpoint robots
        # store for a constant-factor saving
        from img_spark.operators.fetch import robots_sitemap_urls

        sm = [
            r["url"]
            for r in robots_sitemap_urls(
                spark, args.seeds_from_robots,
                user_agent=args.agent, connect_to=args.connect_to,
            ).collect()
        ]
        print(json.dumps({"robots_sitemaps": len(sm)}), flush=True)
        args.seeds_from_sitemaps = sorted(
            set(args.seeds_from_sitemaps) | set(sm)
        )

    if args.seeds_from_sitemaps:
        from img_spark.operators.fetch import sitemap_seeds

        discovered = [
            r["url"]
            for r in sitemap_seeds(
                spark, args.seeds_from_sitemaps,
                user_agent=args.agent, connect_to=args.connect_to,
            ).collect()
        ]
        print(json.dumps({"sitemap_seeds": len(discovered)}), flush=True)
        args.seeds = sorted(set(args.seeds) | set(discovered))

    if args.fetch_mode == "http" and args.pages is None:
        from img_spark.sources.synthweb import PAGES_DDL

        pages = spark.createDataFrame([], PAGES_DDL)  # unused seam side
        fmt = None
    else:
        fmt = args.pages_format
    if fmt == "auto":
        fmt = "warc" if args.pages.rstrip("*").rstrip("/").endswith(
            (".warc", ".warc.gz")
        ) or ".warc" in args.pages.rsplit("/", 1)[-1] else "table"
    if fmt is None:
        pass  # http mode without a pages table: seam unused
    elif fmt == "warc":
        from pyspark import StorageLevel

        from img_spark.sources.warc import read_warc_pages

        # persist: every generation's fetch join consumes self.pages —
        # without this the whole archive set is gunzipped + re-parsed
        # once per generation (and once more per two-level pass)
        pages = read_warc_pages(spark, args.pages).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        if args.pages_buckets and not args.materialize_pages:
            raise SystemExit(
                "--pages-buckets requires a bucket-partitioned table; "
                "materialize the WARC input first "
                "(job.py --materialize-pages OUT)"
            )
    elif args.pages_buckets and not args.materialize_pages:
        pages = read_pages_bucketed(spark, args.pages)
    else:
        pages = read_pages(spark, args.pages)
    if args.wet:
        from pyspark.sql import functions as F

        from img_spark.sources.tables import PAGES_BUCKET_COL
        from img_spark.sources.warc import read_wet_text

        keep = ["url", "warc_ts", "html", "text", "lang"] + (
            [PAGES_BUCKET_COL] if PAGES_BUCKET_COL in pages.columns else []
        )
        # one text row per url: WET globs spanning segments carry
        # revisit duplicates, and a fan-out here would break the
        # unique-url pages-table invariant the fetch join assumes
        # (deterministic winner: lexicographic max)
        text = read_wet_text(spark, args.wet).groupBy("url").agg(
            F.max("text").alias("text")
        )
        pages = (
            pages.drop("text")
            .join(text, "url", "left")
            .na.fill({"text": ""})
            .select(*keep)
        )
        if not args.materialize_pages:
            # crawl mode: without this, every generation's fetch join
            # re-reads and re-parses the full WET archive set
            from pyspark import StorageLevel

            pages = pages.persist(StorageLevel.MEMORY_AND_DISK)
    if args.materialize_pages:
        from img_spark.sources.tables import write_pages_bucketed

        n_buckets = args.pages_buckets or 1024
        write_pages_bucketed(pages, args.materialize_pages, n_buckets)
        n = spark.read.parquet(args.materialize_pages).count()
        print(json.dumps({
            "materialized": args.materialize_pages,
            "rows": n, "buckets": n_buckets, "done": True,
        }), flush=True)
        return 0
    if curate_only:
        # WARC/WET → corpus with no crawl: the pages input's text
        # column becomes the document set
        from img_spark.plans.corpus import build_corpus, pages_documents

        summary = build_corpus(
            spark, None, args.curate,
            sample_rates=_sample_rates(args.curate_rates),
            near_dup_threshold=args.curate_near_dup,
            versioned=args.curate_versioned,
            documents=pages_documents(
                pages, text_source=args.curate_text or "full"
            ),
        )
        print(json.dumps(
            {"curated": args.curate, **summary, "done": True}
        ), flush=True)
        return 0
    config_rows = (
        load_site_config_rows(args.config) if args.config else []
    )
    if args.robots_rules:
        robots = spark.read.parquet(args.robots_rules).select(
            "host", "path_prefix", "allow", "crawl_delay"
        )
    elif args.robots_bodies:
        robots = robots_rules_from_bodies(
            spark.read.parquet(args.robots_bodies), agent=args.agent
        )
    else:
        # fetch_mode='http' with no pre-built rules: the crawler
        # fetches robots.txt LAZILY, executor-side, for seed hosts at
        # init and for hosts discovered mid-crawl at enqueue time, and
        # persists the rules under {checkpoint}/robots/ — so --resume
        # needs no re-fetch and no driver-side host collection (the
        # old bootstrap collected every pending host to the driver:
        # unbounded at a 10^10-URL frontier)
        robots = robots_df(spark, [])
    # live robots stays ON in http mode even with a static table
    # (round-5 ADVICE): static hosts remain authoritative inside the
    # Crawler (never fetched live), but hosts the table doesn't cover —
    # discovered mid-crawl — get lazy robots.txt fetches instead of
    # allow-all admission with zero delay
    live_robots = args.fetch_mode == "http" and not args.no_live_robots

    cfg = CrawlConfig(
        checkpoint_dir=args.checkpoint,
        partitions=args.partitions,
        host_budget=args.host_budget,
        global_budget=args.global_budget,
        album_policy=args.album_policy,
        main_text=args.main_text,
        seen_mode=args.seen_mode,
        cuckoo_capacity=args.cuckoo_capacity,
        max_generations=args.max_generations,
        priority=args.priority,
        priority_score=args.priority_score,
        dispatch_salts=args.dispatch_salts,
        compact_every=args.compact_every,
        backoff_failures=args.backoff_failures,
        pages_buckets=args.pages_buckets,
        fetch_mode=args.fetch_mode,
        http_connect_to=args.connect_to,
        http_user_agent=args.agent,
        archive_dir=args.archive_dir,
        live_robots=live_robots,
        robots_ttl_s=args.robots_ttl,
        http_retries=args.http_retries,
        redirect_policy=args.redirect_policy,
        revisit_after_s=args.revisit_after,
        revisit_every=args.revisit_every,
        revisit_min_s=args.revisit_min,
        revisit_max_s=args.revisit_max,
        media_dir=args.media_dir,
    )
    host_budgets = (
        spark.read.parquet(args.host_budgets).select("host", "budget")
        if args.host_budgets
        else None
    )
    if args.rank_hosts:
        # validate BEFORE any I/O: a bad flag combination must fail
        # with the message, not with a parquet read error
        if not args.resume:
            raise SystemExit("--rank-hosts needs --resume (the scores "
                             "come from the checkpoint's own link graph)")
        if args.host_scores:
            raise SystemExit("--rank-hosts and --host-scores are "
                             "mutually exclusive")
    host_scores = (
        spark.read.parquet(args.host_scores).select("host", "score")
        if args.host_scores
        else None
    )
    if args.rank_hosts:
        from img_spark.operators.linkgraph import host_rank, link_edges

        host_scores = host_rank(
            link_edges(spark, cfg.checkpoint_dir)
        ).persist()
        n_hosts = host_scores.count()  # materialize ONCE, before the loop
        print(json.dumps({"ranked_hosts": n_hosts}), flush=True)
    crawler = Crawler(
        spark, pages, config_rows, robots, cfg, host_budgets=host_budgets,
        host_scores=host_scores,
    )

    if args.resume:
        g = crawler.resume()
        print(json.dumps({"resumed_generation": g}), flush=True)
        stats: dict = {}
    else:
        stats = crawler.init(args.seeds)
        print(json.dumps({"generation": 0, **stats}), flush=True)

    for _ in range(args.max_generations):
        t0 = time.time()
        stats = crawler.step()
        line = {
            "generation": crawler.generation,
            "wall_s": round(time.time() - t0, 2),
            "step_times": crawler.last_step_times,
            **stats,
        }
        print(json.dumps(line), flush=True)
        if cfg.compact_every and crawler.generation % cfg.compact_every == 0:
            crawler.compact(prune=True)
        if not stats.get("pending", 0):
            if cfg.revisit_after_s > 0 and args.revisit_poll > 0:
                # continuous mode: the frontier is drained NOW, but
                # fetched URLs come due for revisit as their TTL
                # elapses — sleep and keep stepping (bounded by
                # --max-generations)
                time.sleep(args.revisit_poll)
                continue
            break

    if args.curate:
        from img_spark import fsio
        from img_spark.plans.corpus import (
            build_corpus,
            build_corpus_incremental,
            recover_corpus_swap,
            resolve_corpus,
        )

        # an interrupted legacy swap must be repaired BEFORE the
        # full-vs-incremental decision below — a crash mid-swap leaves
        # out_dir absent and would otherwise silently trigger a FULL
        # rebuild (round-6 ADVICE)
        action = recover_corpus_swap(args.curate)
        if action:
            print(json.dumps({"corpus_recovery": action}), flush=True)
        # a corpus with merge state under its live data dir (pointer-
        # resolved in the versioned layout) means a previous --curate
        # ran: fold only the NEW generations in (incremental ≡ full
        # re-curation — plans/corpus.py merge contracts) instead of
        # re-running the per-document compute over the whole corpus
        if fsio.exists(
            fsio.join(resolve_corpus(args.curate), "_state", "meta.json")
        ):
            # near-dup threshold is corpus state — a differing
            # --curate-near-dup raises instead of being silently
            # ignored (the stored threshold governs the merge)
            summary = build_corpus_incremental(
                spark, args.checkpoint, args.curate,
                sample_rates=_sample_rates(args.curate_rates),
                near_dup_threshold=args.curate_near_dup,
                versioned=args.curate_versioned,
                text_source=args.curate_text,
            )
        else:
            summary = build_corpus(
                spark, args.checkpoint, args.curate,
                sample_rates=_sample_rates(args.curate_rates),
                near_dup_threshold=args.curate_near_dup,
                versioned=args.curate_versioned,
                text_source=args.curate_text or "full",
            )
        print(json.dumps({"curated": args.curate, **summary}), flush=True)

    if args.media_corpus:
        from img_spark.plans.corpus import media_documents

        pairs = media_documents(
            spark, args.checkpoint, media_dir=args.media_dir
        )
        pairs.write.mode("overwrite").parquet(args.media_corpus)
        n = spark.read.parquet(args.media_corpus).count()
        print(json.dumps(
            {"media_corpus": args.media_corpus, "media_rows": n}
        ), flush=True)

    print(json.dumps({
        "done": True,
        "generation": crawler.generation,
        "frontier_status": stats,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
