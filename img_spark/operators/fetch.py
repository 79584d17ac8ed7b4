"""Live HTTP fetch: the real-crawl variant of the fetch seam.

The crawl loop's default "fetch" is an equi-join against a pre-built
pages table (Common-Crawl-style corpus — plans/crawl.py step()). This
module is the OTHER side of that seam (SURVEY.md §2.1 S2 "real-crawl
variant"; reference behavior: curl-based fetch, main.rs:83-111): a
connection-pooled HTTP client inside ``mapInPandas``, returning the
same (url, html, host) shape so everything downstream — extraction,
robots, seen-set, frontier state — is identical. A URL that fails
(non-2xx, timeout, connection error) simply emits no row; the loop's
existing anti-join then records it as ``fetch_failed``, exactly like a
miss against the pages table.

Scale shape: the dispatch batch is repartitioned by host so each
host's URLs land in ONE task — that task reuses a single keep-alive
connection per host and enforces the robots ``crawl_delay`` serially
(politeness is a per-host property; co-locating the host makes it
enforceable without coordination). Different hosts proceed in
parallel across tasks. Output is yielded in bounded pandas batches so
task memory is O(batch), not O(dispatch).

Hermetic testing: ``connect_to`` overrides where the TCP connection
goes (curl's ``--resolve``/proxy pattern) while the request line and
Host header still carry the URL's real host — tests point it at a
loopback server serving the fixture site; production leaves it None.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# bounded output batches (mirrors sources/warc.py)
_FLUSH_ROWS = 1024

FETCH_SCHEMA = "url string, html binary, host string"


def _parse_connect_to(connect_to: str):
    from urllib.parse import urlsplit

    s = urlsplit(connect_to)
    if not s.scheme or not s.netloc:
        raise ValueError(f"connect_to must be scheme://host[:port]: {connect_to}")
    return s.scheme, s.hostname, s.port


def _netloc_norm(netloc: str, scheme: str) -> str:
    """RFC 3986 host comparison form: the host is case-insensitive and
    an explicit default port (:80 http / :443 https) is equivalent to
    none — without this, a redirect from example.com to
    HTTP://EXAMPLE.COM/x or example.com:443 is misclassified as
    cross-host (strict mode would park it through a needless
    one-generation admission detour and seed case-variant host rows
    into the frontier and robots store — round-6 ADVICE)."""
    n = netloc.lower()
    default = {"http": ":80", "https": ":443"}.get(scheme.lower())
    if default and n.endswith(default):
        n = n[: -len(default)]
    return n


def _parse_retry_after(value: str | None) -> float | None:
    """RFC 9110 §10.2.3 Retry-After: delta-seconds or an HTTP-date.
    Returns seconds (≥0) or None when absent/unparseable."""
    if not value:
        return None
    v = value.strip()
    # ASCII digits only: str.isdigit() alone accepts Unicode digit
    # forms ('²', '①') that float() rejects — and this parser exists
    # to defend against hostile headers, so it must never raise
    if v.isascii() and v.isdigit():
        return float(v)
    try:
        from email.utils import parsedate_to_datetime
        import datetime as _dt

        dt = parsedate_to_datetime(v)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=_dt.timezone.utc)
        return max(
            0.0,
            (dt - _dt.datetime.now(_dt.timezone.utc)).total_seconds(),
        )
    except (TypeError, ValueError):
        return None


def _request_once(
    conns: dict,
    s,
    user_agent: str,
    timeout_s: float,
    max_bytes: int,
    connect_to: str | None,
    etag: str | None = None,
    last_modified: str | None = None,
):
    """One GET over the pooled connection for a split URL. Returns
    (status, body, location, etag, last_modified, retry_after):
    status None means a transport error (connect/reset/timeout — the
    connection is retired), status -1 means oversized/undrained
    (connection retired, NOT retryable). ``etag``/``last_modified``
    (validators from a previous fetch) ride out as
    ``If-None-Match``/``If-Modified-Since`` — a 304 comes back with no
    body at all, the revisit path's whole point. The returned
    etag/last_modified are the RESPONSE's validators (kept for the
    next conditional request); ``retry_after`` is the parsed
    Retry-After header in seconds (None when absent/unparseable) —
    the server's own pacing demand on 429/503."""
    import http.client

    if connect_to is not None:
        cscheme, chost, cport = _parse_connect_to(connect_to)
        if cscheme == "url":
            # 'url://host:port': connect here but keep the URL's own
            # scheme — lets a hermetic test serve http while https
            # attempts against the same socket fail the TLS handshake
            # (the scheme-fallback tests need exactly that split)
            cscheme = s.scheme
    else:
        cscheme, chost, cport = s.scheme, s.hostname, s.port
    key = (cscheme, chost, cport, s.netloc)
    conn = conns.get(key)
    try:
        if conn is None:
            cls = (
                http.client.HTTPSConnection
                if cscheme == "https"
                else http.client.HTTPConnection
            )
            conn = cls(chost, cport, timeout=timeout_s)
            conns[key] = conn
        path = s.path or "/"
        if s.query:
            path += "?" + s.query
        conn.putrequest("GET", path, skip_host=True,
                        skip_accept_encoding=True)
        conn.putheader("Host", s.netloc)
        conn.putheader("User-Agent", user_agent)
        conn.putheader("Accept", "*/*")
        if etag:
            conn.putheader("If-None-Match", etag)
        if last_modified:
            conn.putheader("If-Modified-Since", last_modified)
        conn.endheaders()
        r = conn.getresponse()
        body = r.read(max_bytes + 1)
    except Exception:
        try:
            if conn is not None:
                conn.close()
        finally:
            conns.pop(key, None)
        return None, None, None, None, None, None
    if len(body) > max_bytes or not r.isclosed():
        # oversized / not fully drained: unread bytes would poison
        # the keep-alive stream — the NEXT same-host request would
        # see this response's tail. Retire the connection.
        try:
            conn.close()
        finally:
            conns.pop(key, None)
        return -1, None, None, None, None, None
    if 500 <= r.status < 600:
        # a 5xx may leave the server-side connection wedged; retire it
        # so the retry (and the next same-host URL) starts clean
        try:
            conn.close()
        finally:
            conns.pop(key, None)
    return (
        r.status, body, r.getheader("Location"),
        r.getheader("ETag"), r.getheader("Last-Modified"),
        _parse_retry_after(r.getheader("Retry-After")),
    )


def _fetch_one_status(
    conns: dict,
    url: str,
    user_agent: str,
    timeout_s: float,
    max_bytes: int,
    connect_to: str | None,
    max_redirects: int = 3,
    retries: int = 1,
    backoff_s: float = 0.5,
    crawl_delay: float = 0.0,
    same_host_only: bool = False,
    etag: str | None = None,
    last_modified: str | None = None,
    retry_after_cap_s: float = 30.0,
):
    """GET one URL over a pooled connection, following ≤ max_redirects
    redirects. TRANSIENT failures — transport errors (connect/reset/
    timeout), 5xx, and 429 Too Many Requests — are retried up to
    ``retries`` times per hop on a fresh connection after sleeping
    ``max(backoff_s, crawl_delay)``: a retry is a REQUEST, so it must
    respect the host's robots pacing, not shortcut it with a fixed
    half-second. When a 429 or 503 carries ``Retry-After`` (RFC 9110
    §10.2.3 — the server naming its own pacing), the sleep honors it
    up to ``retry_after_cap_s`` (a hostile or misconfigured header
    must not stall a fetch task for an hour; past the cap the host is
    better served by the per-host failure breaker backing it off at
    the scheduler level). Definitive answers (2xx/3xx/other-4xx,
    oversized body) are never retried. Returns
    ``(status, body, redirect, etag, last_modified)``: body bytes for
    a 2xx; status is the final HTTP status, or None for a transport
    failure that survived the retries (also a redirect loop), or -1
    for an oversized/undrained response — callers that must
    distinguish "definitively absent" (4xx) from "unreachable" (None /
    5xx-after-retries) read it (robots.txt semantics, RFC 9309
    §2.3.1). etag/last_modified in the RESULT are the final response's
    validators (next conditional request's inputs).

    ``etag``/``last_modified`` params are a previous fetch's
    validators: sent as ``If-None-Match``/``If-Modified-Since`` on the
    FIRST hop only (they describe the requested URL, not a redirect
    target). A 304 returns ``(304, None, None, etag', lm')`` — no body
    bytes crossed the wire; the caller keeps its archived copy.

    ``same_host_only=True`` (the crawler's strict redirect policy): a
    redirect whose target host differs from the CURRENT hop's (RFC
    3986 comparison: case-insensitive, default ports stripped) is NOT
    followed — the absolute target URL is returned as ``redirect`` so
    the caller can re-enqueue it through robots admission + the
    seen-set instead of fetching a host whose rules were never
    consulted. Same-host hops still follow inline.

    Politeness notes (documented divergences, POLITENESS.md): followed
    redirect hops happen immediately without crawl_delay and without
    robots admission for the target (curl -L reference parity,
    main.rs:83-111 — robots admission happens at enqueue time); with
    ``retries=0`` the behavior is single-attempt curl parity."""
    import time as _time
    from urllib.parse import urljoin, urlsplit

    for hop in range(max_redirects + 1):
        s = urlsplit(url)
        if s.scheme not in ("http", "https") or not s.netloc:
            return None, None, None, None, None
        status = None
        cond = (etag, last_modified) if hop == 0 else (None, None)
        retry_after = None
        for attempt in range(retries + 1):
            if attempt:
                sleep = max(backoff_s, crawl_delay)
                if retry_after is not None:
                    sleep = max(
                        sleep, min(retry_after, retry_after_cap_s)
                    )
                _time.sleep(sleep)
            status, body, location, r_etag, r_lm, retry_after = (
                _request_once(
                    conns, s, user_agent, timeout_s, max_bytes,
                    connect_to, etag=cond[0], last_modified=cond[1],
                )
            )
            if (
                status is not None
                and status != 429
                and not 500 <= status < 600
            ):
                break
        if status is None or status == -1:
            return status, None, None, None, None
        if status == 304:
            # Not Modified: the validators we sent still hold. Echo the
            # response's validators when the server refreshed them
            # (RFC 9110 allows a 304 to carry a new ETag), else the
            # ones we sent.
            return 304, None, None, r_etag or etag, r_lm or last_modified
        if 300 <= status < 400 and location:
            target = urljoin(url, location)
            ts = urlsplit(target)
            if same_host_only and _netloc_norm(
                ts.netloc, ts.scheme
            ) != _netloc_norm(s.netloc, s.scheme):
                return status, None, target, None, None
            url = target
            continue
        if 200 <= status < 300:
            return status, body, None, r_etag, r_lm
        return status, None, None, None, None
    # redirect loop: unresolvable → unreachable
    return None, None, None, None, None


def fetch_pages_http(
    dispatch: DataFrame,
    user_agent: str = "imgbot/1.0",
    timeout_s: float = 10.0,
    max_bytes: int = 8 << 20,
    connect_to: str | None = None,
    partitions: int | None = None,
    flush_rows: int = _FLUSH_ROWS,
    host_concurrency: int = 8,
    retries: int = 1,
    backoff_s: float = 0.5,
    cross_host_redirects: str = "follow",
    conditional: bool = False,
    with_status: bool = False,
) -> DataFrame:
    """(url, host[, crawl_delay]) dispatch batch → (url, html, host) via
    pooled HTTP GETs. Each HOST fetches serially with the robots
    ``crawl_delay`` honored between its requests (rows missing the
    column fetch with no delay), but up to ``host_concurrency``
    DIFFERENT hosts proceed concurrently inside one task — a live
    crawl is latency-bound, and a partition holding many hosts would
    otherwise pay sum-of-hosts wall time instead of max (with per-host
    politeness delays, the sum includes every sleep). Transient
    failures (transport errors, 5xx) retry up to ``retries`` times on
    a fresh connection after ``backoff_s`` (retries=0 restores the
    single-attempt curl parity); definitively failed URLs emit no row.
    Same output shape as the pages-table join, so the two fetch paths
    are interchangeable.

    ``cross_host_redirects='strict'`` adds a ``redirect`` column: a
    URL whose fetch hit a cross-host 3xx emits (url, html=NULL,
    host, redirect=target) instead of following the hop — the caller
    re-enqueues the target through robots admission + the seen-set
    (POLITENESS.md). Same-host redirects still follow inline; the
    default 'follow' keeps the 3-column curl-parity shape.

    ``conditional=True`` (the revisit path): optional ``etag`` /
    ``last_modified`` columns on the dispatch ride out as
    ``If-None-Match``/``If-Modified-Since``, and the output gains
    (etag, last_modified, unchanged) columns — a 304 emits
    (url, html=NULL, unchanged=true) with ZERO body bytes transferred
    (the caller keeps its archived copy and skips re-extraction); a
    200 carries the response's fresh validators for the next visit.

    ``with_status=True`` (the media-download path): EVERY input URL
    emits a row, and the output gains a ``status int`` column — the
    final HTTP status, -1 for oversized, NULL for a transport failure
    that survived the retries. Callers use it to classify failures:
    definitive (4xx except 429, oversized) vs transient (NULL, 5xx,
    429 — worth retrying in a later generation)."""
    import concurrent.futures
    import time as _time

    import pandas as pd

    strict = cross_host_redirects == "strict"
    cols = [F.col("url"), F.col("host")]
    if "crawl_delay" in dispatch.columns:
        cols.append(
            F.coalesce(F.col("crawl_delay"), F.lit(0.0)).alias("crawl_delay")
        )
    else:
        cols.append(F.lit(0.0).alias("crawl_delay"))
    if conditional:
        for c in ("etag", "last_modified"):
            cols.append(
                F.col(c) if c in dispatch.columns
                else F.lit(None).cast("string").alias(c)
            )
    batch = dispatch.select(*cols)
    if partitions:
        batch = batch.repartition(partitions, "host")
    else:
        batch = batch.repartition("host")

    def fetch_host(host, rows):
        # one serial loop per host: own connection pool (http.client
        # objects are not thread-safe — never shared across hosts),
        # own pacing clock. Buffer bounded by the host's dispatch
        # budget.
        conns: dict = {}
        out = []
        last = None
        for url, delay, c_etag, c_lm in rows:
            if delay and last is not None:
                wait = last + float(delay) - _time.monotonic()
                if wait > 0:
                    _time.sleep(wait)
            status, body, redirect, r_etag, r_lm = _fetch_one_status(
                conns, url, user_agent, timeout_s, max_bytes, connect_to,
                retries=retries, backoff_s=backoff_s,
                crawl_delay=float(delay or 0.0),
                same_host_only=strict,
                etag=c_etag, last_modified=c_lm,
            )
            # pacing clock starts at the END of the last attempt (a
            # retried URL's final request, not its first) so the next
            # URL's spacing can never undercut the robots delay
            last = _time.monotonic()
            if body is not None:
                out.append((url, body, None, r_etag, r_lm, False, status))
            elif conditional and status == 304:
                out.append((url, None, None, r_etag, r_lm, True, status))
            elif strict and redirect is not None:
                out.append((url, None, redirect, None, None, False, status))
            elif with_status:
                # failure row: the caller wants the outcome, not a gap
                out.append((url, None, None, None, None, False, status))
        for c in conns.values():
            try:
                c.close()
            except Exception:
                pass
        return host, out

    def run(pdfs):
        # group across the WHOLE partition before fetching: Arrow caps
        # input batches (~1024 rows), and per-batch state would reset a
        # host's pacing clock and connection pool at every batch
        # boundary — a >1024-URL host would fire one request with zero
        # delay per boundary. Buffered state is (url, delay) STRINGS,
        # not bodies: O(partition's dispatch rows), fine.
        by_host: dict = {}
        for pdf in pdfs:
            etags = pdf["etag"] if conditional else [None] * len(pdf)
            lms = pdf["last_modified"] if conditional else [None] * len(pdf)
            for url, host, delay, c_etag, c_lm in zip(
                pdf["url"], pdf["host"], pdf["crawl_delay"], etags, lms
            ):
                # Arrow→pandas nulls can surface as NaN floats, which
                # are truthy — a header must be a str or absent
                by_host.setdefault(host, []).append((
                    url, delay,
                    c_etag if isinstance(c_etag, str) else None,
                    c_lm if isinstance(c_lm, str) else None,
                ))
        if not by_host:
            return  # empty partition: yield nothing
        for rows in by_host.values():
            rows.sort(key=lambda r: r[0])
        out_rows: list = []
        workers = min(host_concurrency, len(by_host))

        def flush(rows_out):
            d = {
                "url": [r[0] for r in rows_out],
                "html": [r[1] for r in rows_out],
                "host": [r[7] for r in rows_out],
            }
            if strict:
                d["redirect"] = [r[2] for r in rows_out]
            if conditional:
                d["etag"] = [r[3] for r in rows_out]
                d["last_modified"] = [r[4] for r in rows_out]
                d["unchanged"] = [r[5] for r in rows_out]
            df = pd.DataFrame(d)
            if with_status:
                # object dtype keeps None intact for the int column
                df["status"] = pd.Series(
                    [r[6] for r in rows_out], dtype="object"
                )
            return df

        with concurrent.futures.ThreadPoolExecutor(workers) as pool:
            futs = [
                pool.submit(fetch_host, h, rows)
                for h, rows in sorted(by_host.items())
            ]
            for fut in concurrent.futures.as_completed(futs):
                host, fetched = fut.result()
                out_rows.extend(r + (host,) for r in fetched)
                if len(out_rows) >= flush_rows:
                    yield flush(out_rows)
                    out_rows = []
        yield flush(out_rows)

    schema = FETCH_SCHEMA + (", redirect string" if strict else "") + (
        ", etag string, last_modified string, unchanged boolean"
        if conditional else ""
    ) + (", status int" if with_status else "")
    return batch.mapInPandas(run, schema=schema)


def parse_sitemap(body: bytes):
    """Parse one sitemap body (plain or gzipped XML) into
    ``(child_sitemaps, page_urls)`` — a ``<sitemapindex>`` yields its
    ``<loc>`` entries as child sitemaps, a ``<urlset>`` as page URLs.
    Tolerant by construction (regex over ``<loc>``, entity-unescaped):
    real-world sitemaps carry namespace soup and stray bytes that kill
    a strict XML parse, and a crawler wants the URLs, not validation.
    """
    import gzip as _gz
    import html as _html
    import re

    if body[:2] == b"\x1f\x8b":
        try:
            body = _gz.decompress(body)
        except (OSError, EOFError):  # BadGzipFile / truncated stream
            return [], []
    text = body.decode("utf-8", "replace")
    # optional namespace prefix (<ns0:loc>) — prefixed serializations
    # are common and must not silently yield zero URLs
    locs = [
        _html.unescape(m.strip())
        for m in re.findall(
            r"<(?:\w+:)?loc[^>]*>\s*(.*?)\s*</(?:\w+:)?loc>", text, re.S
        )
    ]
    is_index = re.search(r"<\s*(?:\w+:)?sitemapindex[\s>]", text) is not None
    return (locs, []) if is_index else ([], locs)


def sitemap_seeds(
    spark,
    sitemap_urls,
    user_agent: str = "imgbot/1.0",
    connect_to: str | None = None,
    timeout_s: float = 10.0,
    max_depth: int = 3,
    max_index_fanout: int = 10_000,
    max_bytes: int = 64 << 20,
) -> DataFrame:
    """Seed discovery from sitemaps: fetch the given sitemap URLs
    (``https://<host>/sitemap.xml`` is the conventional entry; robots
    ``Sitemap:`` lines are another source), follow ``<sitemapindex>``
    indirections up to ``max_depth``, and return the distinct page
    URLs as a one-column ``url`` DataFrame — feed it to
    ``Crawler.init``/job.py as the frontier's generation 0.

    ``max_bytes`` defaults to 64 MB — above the protocol's own 50 MB
    sitemap limit (the page fetcher's 8 MB default would silently turn
    every large sitemap into zero seeds).

    Scale shape: sitemap BODIES (up to 50 MB each) parse in executors
    — only the parsed LOCATION STRINGS reach the driver, once per
    level, so each sitemap is fetched exactly once and the result is
    deterministic (leaving the fetch lineage lazy would re-fetch every
    sitemap on every downstream action). The seed list ends up
    driver-sized by contract — ``Crawler.init(seeds)`` takes a list.
    Child-index fan-out is capped at ``max_index_fanout`` per level
    (an index of indexes is small by the protocol's own 50k-entry
    limit)."""
    import pandas as pd

    from img_spark.operators.urlexprs import host_of

    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")

    def parse_udf(pdfs):
        for pdf in pdfs:
            kinds, locs = [], []
            for html in pdf["html"]:
                subs, pages = parse_sitemap(bytes(html))
                kinds.extend(["sitemap"] * len(subs) + ["page"] * len(pages))
                locs.extend(subs + pages)
            yield pd.DataFrame({"kind": kinds, "loc": locs})

    current = list(dict.fromkeys(sitemap_urls))
    pages: set = set()
    for _depth in range(max_depth):
        if not current:
            break
        got = fetch_pages_http(
            spark.createDataFrame([(u,) for u in current], "url string")
            .withColumn("host", host_of(F.col("url"))),
            user_agent=user_agent, timeout_s=timeout_s,
            connect_to=connect_to, max_bytes=max_bytes,
        )
        parsed = got.select("html").mapInPandas(
            parse_udf, schema="kind string, loc string"
        ).collect()  # ONE fetch per level; loc strings only
        pages.update(r["loc"] for r in parsed if r["kind"] == "page")
        current = list(dict.fromkeys(
            r["loc"] for r in parsed if r["kind"] == "sitemap"
        ))[:max_index_fanout]
    return spark.createDataFrame(
        [(u,) for u in sorted(pages)], "url string"
    )


def robots_sitemap_urls(
    spark,
    hosts,
    user_agent: str = "imgbot/1.0",
    scheme: str = "https",
    connect_to: str | None = None,
    timeout_s: float = 10.0,
) -> DataFrame:
    """Discover sitemap entry points from robots.txt ``Sitemap:`` lines
    (the sitemaps protocol's own discovery mechanism): fetch each
    host's robots.txt through the pooled path and return the declared
    sitemap URLs as a one-column ``url`` DataFrame — feed it to
    ``sitemap_seeds`` to bootstrap a frontier from nothing but a host
    list. Hosts without robots.txt (or without Sitemap lines)
    contribute nothing. Parsing runs executor-side."""
    import pandas as pd

    if not isinstance(hosts, DataFrame):
        hosts = spark.createDataFrame(
            [(h,) for h in hosts], "host string"
        )
    urls = hosts.select("host").distinct().select(
        F.concat(
            F.lit(scheme + "://"), F.col("host"), F.lit("/robots.txt")
        ).alias("url"),
        "host",
    )
    got = fetch_pages_http(
        urls, user_agent=user_agent, timeout_s=timeout_s,
        connect_to=connect_to,
    )

    def run(pdfs):
        from img_spark.operators.politeness import parse_robots_sitemaps

        for pdf in pdfs:
            out = []
            for body in pdf["html"]:
                if body is None:
                    continue
                out.extend(
                    parse_robots_sitemaps(
                        bytes(body).decode("utf-8", "replace")
                    )
                )
            yield pd.DataFrame({"url": out})

    return got.select("html").mapInPandas(run, schema="url string").distinct()


def robots_bodies_http(
    spark,
    hosts,
    user_agent: str = "imgbot/1.0",
    scheme: str = "https",
    connect_to: str | None = None,
    timeout_s: float = 10.0,
    retries: int = 1,
    max_bytes: int = 1 << 20,
) -> DataFrame:
    """Fetch each host's ``/robots.txt``, preserving the OUTCOME class
    RFC 9309 §2.3.1 politeness needs: ``ok`` (2xx, body attached),
    ``missing`` (definitive 4xx — "unavailable means no
    restrictions"), ``unreachable`` (transport error / 5xx after
    retries / redirect loop — cached rules may be reused). Callers
    choose the default per outcome. Executor-side, pooled, one
    request per host; ``max_bytes`` defaults to 1 MB (RFC asks
    parsers to handle ≥500 KiB). ``hosts`` is a list or a DataFrame
    with a ``host`` column — an optional ``scheme`` column overrides
    the default per host (a plain-http host must get
    ``http://host/robots.txt``, not a doomed TLS attempt classified
    'unreachable' and crawled allow-all — round-5 ADVICE). A host with
    BOTH schemes in its frontier probes https first; if that probe is
    unreachable (e.g. the host is plain-http and one stray https URL
    forced the preference), the probe retries over http before the
    host is classified unreachable (round-6 ADVICE)."""
    import pandas as pd

    if not isinstance(hosts, DataFrame):
        hosts = spark.createDataFrame(
            [(h,) for h in hosts], "host string"
        )
    if "scheme" in hosts.columns:
        # one request per host: conflicting per-URL schemes resolve to
        # the max ('https' > 'http' — prefer TLS when the host serves
        # both); the full scheme set rides along so an unreachable
        # https probe can fall back to http when the frontier says the
        # host serves plain http too
        hosts = hosts.groupBy("host").agg(
            F.max("scheme").alias("scheme"),
            F.collect_set("scheme").alias("schemes"),
        ).na.fill({"scheme": scheme})
    else:
        hosts = hosts.select("host").distinct().withColumns({
            "scheme": F.lit(scheme),
            "schemes": F.array(F.lit(scheme)),
        })

    def run(pdfs):
        conns: dict = {}
        for pdf in pdfs:
            out_h, out_b, out_o = [], [], []
            for host, sch, schemes in zip(
                pdf["host"], pdf["scheme"], pdf["schemes"]
            ):
                sch = sch or scheme
                status, body, _redir, _e, _l = _fetch_one_status(
                    conns, f"{sch}://{host}/robots.txt",
                    user_agent, timeout_s, max_bytes, connect_to,
                    retries=retries,
                )
                unreachable = status is None or status == -1 or (
                    500 <= status < 600
                )
                if unreachable and sch == "https" and "http" in list(
                    schemes if schemes is not None else []
                ):
                    # mixed-scheme host whose TLS endpoint is broken:
                    # one stray https URL must not turn a plain-http
                    # host's robots probe into allow-all admission
                    status, body, _redir, _e, _l = _fetch_one_status(
                        conns, f"http://{host}/robots.txt",
                        user_agent, timeout_s, max_bytes, connect_to,
                        retries=retries,
                    )
                if status is not None and 200 <= status < 300:
                    outcome = "ok"
                elif status is not None and 400 <= status < 500:
                    outcome, body = "missing", None
                else:
                    outcome, body = "unreachable", None
                out_h.append(host)
                out_b.append(body)
                out_o.append(outcome)
            yield pd.DataFrame(
                {"host": out_h, "body": out_b, "outcome": out_o}
            )
        for c in conns.values():
            try:
                c.close()
            except Exception:
                pass

    return hosts.mapInPandas(
        run, schema="host string, body binary, outcome string"
    )


def robots_rules_from_fetched(bodies: DataFrame, agent: str = "*") -> DataFrame:
    """``outcome='ok'`` rows of ``robots_bodies_http`` → the
    ROBOTS_DDL rules table (RFC 9309 subset parse; a body whose parse
    yields no rules gets one allow-all rule)."""
    import pandas as pd

    from img_spark.operators.politeness import ROBOTS_DDL

    def run(pdfs):
        from img_spark.operators.politeness import parse_robots_txt

        for pdf in pdfs:
            out = []
            for host, body in zip(pdf["host"], pdf["body"]):
                rules = parse_robots_txt(
                    bytes(body).decode("utf-8", "replace"), agent
                ) or [("/", True, 0.0)]
                for path, allow, delay in rules:
                    out.append((host, path, allow, delay))
            yield pd.DataFrame(
                out,
                columns=["host", "path_prefix", "allow", "crawl_delay"],
            )

    return bodies.select("host", "body").mapInPandas(run, schema=ROBOTS_DDL)


def robots_http(
    spark,
    hosts,
    user_agent: str = "imgbot/1.0",
    scheme: str = "https",
    connect_to: str | None = None,
    timeout_s: float = 10.0,
    missing_allow_all: bool = True,
) -> DataFrame:
    """Live robots.txt → ROBOTS_DDL rules in one pass: fetch with
    ``robots_bodies_http`` and parse with the engine's RFC 9309
    subset. A host whose robots.txt is missing OR unreachable gets
    one allow-all rule (the simple bootstrap default); with
    ``missing_allow_all=False`` such hosts emit NO rows instead.
    Callers needing the missing/unreachable distinction (the
    crawler's TTL refresh keeps cached rules for unreachable hosts
    but honors a definitive 404 as allow-all) use
    ``robots_bodies_http`` + ``robots_rules_from_fetched`` directly.
    The whole plan is ONE mapInPandas chain — a single action fetches
    each host exactly once."""
    import pandas as pd

    from img_spark.operators.politeness import ROBOTS_DDL

    bodies = robots_bodies_http(
        spark, hosts, user_agent=user_agent, scheme=scheme,
        connect_to=connect_to, timeout_s=timeout_s,
    )

    def run(pdfs):
        from img_spark.operators.politeness import parse_robots_txt

        for pdf in pdfs:
            out = []
            for host, body, outcome in zip(
                pdf["host"], pdf["body"], pdf["outcome"]
            ):
                if outcome == "ok":
                    rules = parse_robots_txt(
                        bytes(body).decode("utf-8", "replace"), user_agent
                    ) or [("/", True, 0.0)]
                elif missing_allow_all:
                    rules = [("/", True, 0.0)]
                else:
                    continue
                for path, allow, delay in rules:
                    out.append((host, path, allow, delay))
            yield pd.DataFrame(
                out,
                columns=["host", "path_prefix", "allow", "crawl_delay"],
            )

    return bodies.mapInPandas(run, schema=ROBOTS_DDL)
