"""Crawl-shaped oracle queries (SURVEY.md §2.B crawl rows; FIXTURES.md §F).

The DuckDB oracle can't run the engine, so crawl operators are checked
on a **derived frontier view** built deterministically from the driver's
``events`` table (FIXTURES.md §F):

    url               = 'https://host<user_id%50>.example/e/<event_id>'
    registered_domain = 'host<user_id%50>.example'
    depth             = event_id % 8
    host_credit       = (user_id % 100) / 100.0
    priority          = host_credit + exp(-depth) + 0.1 * ln(1 + value)

Spark side composes the real engine operators (canon_url_col,
robots_verdict, anti-join dedupe, politeness window); the oracle
restates them in ANSI SQL. The one intentional divergence: oracle
queries tie-break rankings on ``url`` (DuckDB has no xxhash64) — the
engine's url_hash tie-break is pinned by the golden-trace pytest
instead.

Streaming-surface queries (tumbling/sliding/session windows) run here
in batch form — identical semantics to the Structured Streaming wave
driver (tweetf0rm_spark/streaming), which pytest exercises.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .canon import canon_url_col
from .operators.dedupe import anti_join_seen
from .operators.robots import robots_verdict
from .queries import Q, dsum, t

CRAWL: dict[str, Q] = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        CRAWL[name] = Q(fn, oracle)
        return fn
    return deco


# Shared SQL CTE for the derived frontier (keep in lockstep with
# frontier_view below).
FRONTIER_CTE = """
frontier AS (
  SELECT 'https://host' || CAST(user_id % 50 AS VARCHAR) || '.example/e/'
           || CAST(event_id AS VARCHAR) AS url,
         'host' || CAST(user_id % 50 AS VARCHAR) || '.example' AS host,
         'host' || CAST(user_id % 50 AS VARCHAR) || '.example' AS registered_domain,
         '/e/' || CAST(event_id AS VARCHAR) AS path,
         CAST(event_id % 8 AS INTEGER) AS depth,
         (user_id % 100) / 100.0
           + exp(-CAST(event_id % 8 AS INTEGER))
           + 0.1 * ln(1.0 + value) AS priority,
         event_id, user_id, value
  FROM events)
"""


def frontier_view(spark, sf):
    """Derived frontier DataFrame — numerically identical expression
    tree to FRONTIER_CTE (exp/ln covered by 6-dp output rounding)."""
    e = t(spark, sf, "events")
    dom_num = F.pmod(F.col("user_id"), F.lit(50)).cast("string")
    host = F.concat(F.lit("host"), dom_num, F.lit(".example"))
    depth = F.pmod(F.col("event_id"), F.lit(8)).cast("int")
    prio = (
        F.pmod(F.col("user_id"), F.lit(100)) / 100.0
        + F.exp(-depth.cast("double"))
        + 0.1 * F.log(F.lit(1.0) + F.col("value"))
    )
    return e.select(
        F.concat(F.lit("https://"), host, F.lit("/e/"),
                 F.col("event_id").cast("string")).alias("url"),
        host.alias("host"),
        host.alias("registered_domain"),
        F.concat(F.lit("/e/"), F.col("event_id").cast("string")).alias("path"),
        depth.alias("depth"),
        prio.alias("priority"),
        "event_id",
        "user_id",
        "value",
    )


# Inline robots rules used by the robots/wave queries: even-numbered
# domains disallow the '/e/1' prefix (rule 0), everyone allows '/'.
ROBOTS_SQL = """
robots AS (
  SELECT 'host' || CAST(d AS VARCHAR) || '.example' AS host,
         0 AS rule_order, false AS allow, '/e/1' AS path_prefix,
         0.0 AS crawl_delay, '*' AS agent
  FROM (SELECT unnest(range(0, 50, 2)) AS d)
  UNION ALL
  SELECT 'host' || CAST(d AS VARCHAR) || '.example', 1, true, '/', 0.0, '*'
  FROM (SELECT unnest(range(0, 50)) AS d))
"""


def robots_df(spark):
    rows = []
    for d in range(0, 50, 2):
        rows.append((f"host{d}.example", 0, False, "/e/1", 0.0, "*"))
    for d in range(50):
        rows.append((f"host{d}.example", 1, True, "/", 0.0, "*"))
    return spark.createDataFrame(
        rows,
        "host string, rule_order int, allow boolean, path_prefix string, "
        "crawl_delay double, agent string",
    )


# --------------------------------------------------------------- canon

@q(
    "crawl_canonicalize",
    """SELECT event_id,
              'https://host' || CAST(user_id % 50 AS VARCHAR)
                || '.example/e/' || CAST(event_id AS VARCHAR)
                || '?a=1&b=2' AS url_canon
       FROM events""",
)
def crawl_canonicalize(spark, sf):
    """Oracle-validates canon_url_col against an independent SQL
    construction: the raw side has uppercase scheme/host, a default
    port, duplicate slashes, a trailing slash, unsorted query keys, a
    tracker param, and a fragment."""
    e = t(spark, sf, "events")
    raw = F.concat(
        F.lit("HTTPS://HOST"),
        F.pmod(F.col("user_id"), F.lit(50)).cast("string"),
        F.lit(".Example:443/e//"),
        F.col("event_id").cast("string"),
        F.lit("/?b=2&a=1&utm_source=x#frag"),
    )
    return e.select(
        "event_id", canon_url_col(raw).alias("url_canon")
    )


@q(
    "crawl_url_parts",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')})
       SELECT url, host, registered_domain, path,
              md5(url) AS url_md5
       FROM frontier""",
)
def crawl_url_parts(spark, sf):
    fv = frontier_view(spark, sf)
    return fv.select(
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.concat_ws(
            ".", F.slice(F.split(F.parse_url("url", F.lit("HOST")), "\\."), -2, 2)
        ).alias("registered_domain"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.md5("url").alias("url_md5"),
    )


# -------------------------------------------------------------- dedupe

@q(
    "crawl_url_dedupe",
    """WITH coarse AS (
         SELECT 'host' || CAST(user_id % 50 AS VARCHAR) || '.example'
                  AS registered_domain,
                'https://host' || CAST(user_id % 50 AS VARCHAR)
                  || '.example/p/' || CAST(event_id % 500 AS VARCHAR) AS url
         FROM events)
       SELECT registered_domain,
              count(DISTINCT url) AS n_unique,
              count(*) AS n_raw
       FROM coarse GROUP BY registered_domain""",
)
def crawl_url_dedupe(spark, sf):
    e = t(spark, sf, "events")
    dom = F.concat(
        F.lit("host"), F.pmod("user_id", F.lit(50)).cast("string"), F.lit(".example")
    )
    url = F.concat(
        F.lit("https://"), dom, F.lit("/p/"),
        F.pmod("event_id", F.lit(500)).cast("string"),
    )
    return (
        e.select(dom.alias("registered_domain"), url.alias("url"))
        .groupBy("registered_domain")
        .agg(
            F.countDistinct("url").alias("n_unique"),
            F.count("*").alias("n_raw"),
        )
    )


@q(
    "crawl_seen_anti_join",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')}),
       seen AS (SELECT url FROM frontier WHERE event_id % 10 = 0)
       SELECT f.registered_domain, count(*) AS n_novel
       FROM frontier f
       WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.url = f.url)
       GROUP BY f.registered_domain""",
)
def crawl_seen_anti_join(spark, sf):
    fv = frontier_view(spark, sf)
    seen = fv.filter(F.col("event_id") % 10 == 0).select("url")
    novel = anti_join_seen(fv, seen, key="url")
    return novel.groupBy("registered_domain").agg(F.count("*").alias("n_novel"))


# -------------------------------------------------------------- robots

@q(
    "crawl_robots_filter",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')}),
       {ROBOTS_SQL.strip().lstrip()},
       verdict AS (
         SELECT f.url, f.registered_domain,
                coalesce(arg_min(r.allow, r.rule_order), true) AS robots_allowed
         FROM frontier f
         LEFT JOIN robots r
           ON r.host = f.host AND starts_with(f.path, r.path_prefix)
         GROUP BY f.url, f.registered_domain)
       SELECT registered_domain,
              count(*) FILTER (robots_allowed) AS n_allowed,
              count(*) FILTER (NOT robots_allowed) AS n_blocked
       FROM verdict GROUP BY registered_domain""",
)
def crawl_robots_filter(spark, sf):
    fv = frontier_view(spark, sf)
    ruled = robots_verdict(fv, robots_df(spark))
    return ruled.groupBy("registered_domain").agg(
        F.count_if(F.col("robots_allowed")).alias("n_allowed"),
        F.count_if(~F.col("robots_allowed")).alias("n_blocked"),
    )


# ---------------------------------------------------- politeness / order

@q(
    "crawl_politeness_topk",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')}),
       ranked AS (
         SELECT registered_domain, url, depth, priority,
                row_number() OVER (PARTITION BY registered_domain
                                   ORDER BY priority DESC, url) AS host_rank
         FROM frontier)
       SELECT registered_domain, url, host_rank, round(priority, 6) AS prio
       FROM ranked
       WHERE host_rank <= 1 + (CAST(substr(registered_domain, 5,
                 length(registered_domain) - 12) AS INTEGER) % 4)""",
)
def crawl_politeness_topk(spark, sf):
    fv = frontier_view(spark, sf)
    w = W.partitionBy("registered_domain").orderBy(F.desc("priority"), F.asc("url"))
    dom_num = F.substring(
        F.col("registered_domain"),
        5,
        F.length("registered_domain") - 12,
    ).cast("int")
    return (
        fv.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= 1 + F.pmod(dom_num, F.lit(4)))
        .select(
            "registered_domain", "url", "host_rank",
            F.round("priority", 6).alias("prio"),
        )
    )


@q(
    "crawl_bfs_order",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')})
       SELECT event_id, url, depth,
              row_number() OVER (ORDER BY depth, priority DESC, url) AS bfs_rank
       FROM frontier
       ORDER BY bfs_rank LIMIT 200""",
)
def crawl_bfs_order(spark, sf):
    fv = frontier_view(spark, sf)
    w = W.orderBy(F.asc("depth"), F.desc("priority"), F.asc("url"))
    return (
        fv.withColumn("bfs_rank", F.row_number().over(w))
        .filter(F.col("bfs_rank") <= 200)
        .select("event_id", "url", "depth", "bfs_rank")
    )


@q(
    "crawl_wave_schedule",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')}),
       {ROBOTS_SQL.strip().lstrip()},
       seen AS (SELECT url FROM frontier WHERE event_id % 10 = 0),
       novel AS (SELECT * FROM frontier f
                 WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.url = f.url)),
       verdict AS (
         SELECT n.*, coalesce(arg_min(r.allow, r.rule_order), true) AS ok
         FROM novel n
         LEFT JOIN robots r
           ON r.host = n.host AND starts_with(n.path, r.path_prefix)
         GROUP BY ALL),
       polite AS (
         SELECT *, row_number() OVER (PARTITION BY registered_domain
                                      ORDER BY priority DESC, url) AS host_rank
         FROM verdict WHERE ok),
       batch AS (SELECT * FROM polite WHERE host_rank <= 8)
       SELECT row_number() OVER (ORDER BY priority DESC, depth, url) AS fetch_order,
              url, registered_domain, depth, round(priority, 6) AS prio
       FROM batch
       ORDER BY fetch_order LIMIT 200""",
)
def crawl_wave_schedule(spark, sf):
    """The flagship M1 slice (SURVEY.md §7): dedupe → robots →
    politeness → global priority order → fetch batch, composed from
    the real engine operators."""
    fv = frontier_view(spark, sf)
    seen = fv.filter(F.col("event_id") % 10 == 0).select("url")
    novel = anti_join_seen(fv, seen, key="url")
    ruled = robots_verdict(novel, robots_df(spark))
    allowed = ruled.filter(F.col("robots_allowed"))
    wp = W.partitionBy("registered_domain").orderBy(F.desc("priority"), F.asc("url"))
    batch = allowed.withColumn("host_rank", F.row_number().over(wp)).filter(
        F.col("host_rank") <= 8
    )
    wg = W.orderBy(F.desc("priority"), F.asc("depth"), F.asc("url"))
    return (
        batch.withColumn("fetch_order", F.row_number().over(wg))
        .filter(F.col("fetch_order") <= 200)
        .select(
            "fetch_order", "url", "registered_domain", "depth",
            F.round("priority", 6).alias("prio"),
        )
    )


@q(
    "crawl_lineage_rollup",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')})
       SELECT registered_domain, depth, count(*) AS n,
              count(DISTINCT user_id) AS n_users
       FROM frontier
       GROUP BY ROLLUP (registered_domain, depth)""",
)
def crawl_lineage_rollup(spark, sf):
    fv = frontier_view(spark, sf)
    return fv.rollup("registered_domain", "depth").agg(
        F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users")
    )


@q(
    "crawl_recrawl_age",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')}),
       last AS (SELECT registered_domain,
                       max(e.ts) AS last_ts
                FROM frontier f JOIN events e USING (event_id)
                GROUP BY registered_domain)
       SELECT registered_domain,
              CAST(floor(epoch(last_ts)) AS BIGINT) AS last_epoch,
              CAST(date_diff('day', last_ts, TIMESTAMP '2024-03-01') AS BIGINT)
                AS age_days
       FROM last""",
)
def crawl_recrawl_age(spark, sf):
    fv = frontier_view(spark, sf)
    e = t(spark, sf, "events").select("event_id", "ts")
    last = (
        fv.join(e, "event_id")
        .groupBy("registered_domain")
        .agg(F.max("ts").alias("last_ts"))
    )
    return last.select(
        "registered_domain",
        F.unix_timestamp("last_ts").alias("last_epoch"),
        F.datediff(F.to_date(F.lit("2024-03-01")), F.col("last_ts"))
        .cast("long")
        .alias("age_days"),
    )


@q(
    "crawl_host_sorted_batches",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')})
       SELECT url, registered_domain, depth, round(priority, 6) AS prio
       FROM frontier WHERE depth <= 2""",
)
def crawl_host_sorted_batches(spark, sf):
    """Per-host sorted fetch batches via ``sortWithinPartitions``
    (SURVEY.md §2.B partition-local sort): repartition by
    registered_domain so a host's rows land in one partition, then sort
    locally by (domain, priority desc, url) — NO global sort shuffle, a
    fetch worker streams its partition in politeness order. Content is
    oracle-checked (order-insensitive); the within-partition ordering
    itself is pinned by ``test_sort_within_partitions`` (mapInPandas
    sortedness probe)."""
    fv = frontier_view(spark, sf).filter(F.col("depth") <= 2)
    return (
        fv.repartition(F.col("registered_domain"))
        .sortWithinPartitions(
            "registered_domain", F.desc("priority"), F.asc("url")
        )
        .select(
            "url", "registered_domain", "depth",
            F.round("priority", 6).alias("prio"),
        )
    )


@q(
    "crawl_canonicalize_udf",
    """SELECT event_id,
              'https://host' || CAST(user_id % 50 AS VARCHAR)
                || '.example/e/' || CAST(event_id AS VARCHAR)
                || '?a=1&a=0&b=2&path=~' AS url_canon
       FROM events""",
)
def crawl_canonicalize_udf(spark, sf):
    """The registered scalar ``@pandas_udf`` surface (SURVEY.md §2.B):
    the GENERAL canonicalization path — raw URLs here carry duplicate
    query keys (spec: stable sort, first-seen order within a key) and
    percent-escapes needing normalization (%61→'a', %7E→'~'), both
    outside the builtin chain's grammar (canon.py module docstring), so
    this MUST route through ``canon_url_pandas``. Arrow-batched
    Series→Series; one Python crossing."""
    from pyspark.sql.functions import pandas_udf

    from .canon import canon_url_pandas

    canon_udf = pandas_udf(canon_url_pandas, "string")
    e = t(spark, sf, "events")
    raw = F.concat(
        F.lit("HTTPS://HOST"),
        F.pmod(F.col("user_id"), F.lit(50)).cast("string"),
        F.lit(".Example:443/e//"),
        F.col("event_id").cast("string"),
        F.lit("/?b=2&a=1&a=0&p%61th=%7E&utm_source=x#frag"),
    )
    return e.select("event_id", canon_udf(raw).alias("url_canon"))


@q(
    "crawl_budget_udaf",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')})
       SELECT registered_domain,
              count(*) AS n_urls,
              1 + (CAST(substr(registered_domain, 5,
                    length(registered_domain) - 12) AS INTEGER) % 4) AS budget,
              least(count(*), 1 + (CAST(substr(registered_domain, 5,
                    length(registered_domain) - 12) AS INTEGER) % 4)) AS fetched,
              count(*) - least(count(*), 1 + (CAST(substr(registered_domain, 5,
                    length(registered_domain) - 12) AS INTEGER) % 4)) AS deferred,
              round(max(priority), 6) AS top_prio
       FROM frontier GROUP BY registered_domain""",
)
def crawl_budget_udaf(spark, sf):
    """Per-host budget accounting as a pandas UDAF (SURVEY.md §2.B
    "pandas UDAF — per-group 1-row"): ``applyInPandas`` over
    registered_domain groups, each kernel invocation reduces one
    domain's frontier slice to ONE accounting row (urls, budget,
    fetched-vs-deferred split, top priority). The grouped-map shuffle is
    the same hash-by-domain exchange the politeness window needs —
    exchange-compatible at scale."""
    import pandas as pd

    fv = frontier_view(spark, sf).select(
        "registered_domain", "priority"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        dom = pdf["registered_domain"].iloc[0]
        num = int(dom[4 : len(dom) - 8])  # 'host<k>.example'
        budget = 1 + num % 4
        n = len(pdf)
        return pd.DataFrame(
            {
                "registered_domain": [dom],
                "n_urls": [n],
                "budget": [budget],
                "fetched": [min(n, budget)],
                "deferred": [n - min(n, budget)],
                "top_prio": [round(float(pdf["priority"].max()), 6)],
            }
        )

    return fv.groupBy("registered_domain").applyInPandas(
        kernel,
        "registered_domain string, n_urls long, budget int, "
        "fetched long, deferred long, top_prio double",
    )


# ------------------------------------------------- streaming-shaped aggs

@q(
    "stream_tumbling_window",
    """SELECT CAST(epoch(time_bucket(INTERVAL '15 minutes', ts)) AS BIGINT)
                AS window_start,
              event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
       FROM events GROUP BY 1, 2""",
)
def stream_tumbling_window(spark, sf):
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "total"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type", "n", "total",
        )
    )


@q(
    "stream_sliding_window",
    """WITH s AS (
         SELECT time_bucket(INTERVAL '15 minutes', ts) AS ws, * FROM events
         UNION ALL
         SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes',
                * FROM events)
       SELECT CAST(epoch(ws) AS BIGINT) AS window_start,
              count(*) AS n
       FROM s GROUP BY 1""",
)
def stream_sliding_window(spark, sf):
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "30 minutes", "15 minutes"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"), "n"
        )
    )


@q(
    "stream_sessionization",
    """WITH g AS (
         SELECT user_id, ts,
                CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                          - lag(CAST(floor(epoch(ts)) AS BIGINT))
                            OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                     THEN 1 ELSE 0 END AS is_new
         FROM events)
       SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events
       FROM g GROUP BY user_id""",
)
def stream_sessionization(spark, sf):
    e = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    g = e.select(
        "user_id",
        F.when(
            (ep - F.lag(ep).over(w) > 1800) | F.lag("ts").over(w).isNull(), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return g.groupBy("user_id").agg(
        F.sum("is_new").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@q(
    "stream_lifetime_budget",
    """WITH c AS (
         SELECT 'https://host' || CAST(user_id % 50 AS VARCHAR)
                  || '.example/e/' || CAST(event_id AS VARCHAR) AS url,
                event_id AS url_hash,
                'host' || CAST(user_id % 50 AS VARCHAR) || '.example'
                  AS registered_domain,
                event_id % 2 AS batch_no
         FROM events WHERE event_id < 2000),
       r AS (SELECT url, url_hash, registered_domain,
                    row_number() OVER (
                      PARTITION BY registered_domain
                      ORDER BY batch_no, url_hash) AS lifetime_rank
             FROM c)
       SELECT url, url_hash, registered_domain, lifetime_rank
       FROM r WHERE lifetime_rank <= 12""",
)
def stream_lifetime_budget(spark, sf):
    """Custom stateful streaming operator, run for real: a 2-micro-batch
    Structured Streaming drain through ``lifetime_budget_stream``
    (applyInPandasWithState; streaming/stateful.py). The candidate set
    is split by ``event_id % 2`` into two parquet files with strictly
    increasing mtimes, streamed with ``maxFilesPerTrigger=1`` so the
    trigger order — and therefore the cross-batch admit order — is
    pinned (batch_no, url_hash). That determinism is what makes a FULL
    SQL oracle possible for a stateful streaming op: the oracle
    restates it as a rank over (batch_no, url_hash) capped at the
    lifetime budget. State = one counter per domain, carried across
    triggers by the state store."""
    import os
    import tempfile

    from .streaming.stateful import lifetime_budget_stream

    e = t(spark, sf, "events").filter(F.col("event_id") < 2000)
    cand = e.select(
        F.concat(
            F.lit("https://host"),
            (F.col("user_id") % 50).cast("string"),
            F.lit(".example/e/"),
            F.col("event_id").cast("string"),
        ).alias("url"),
        F.col("event_id").alias("url_hash"),
        F.concat(
            F.lit("host"), (F.col("user_id") % 50).cast("string"),
            F.lit(".example"),
        ).alias("registered_domain"),
        (F.col("event_id") % 2).alias("batch_no"),
    )
    root = tempfile.mkdtemp(prefix="lifetime_budget_")
    fdir = os.path.join(root, "in")
    for b in (0, 1):
        part = os.path.join(root, f"b{b}")
        cand.filter(F.col("batch_no") == b).drop("batch_no").coalesce(
            1
        ).write.parquet(part)
        os.makedirs(fdir, exist_ok=True)
        src = [f for f in os.listdir(part) if f.endswith(".parquet")][0]
        dst = os.path.join(fdir, f"batch{b}.parquet")
        os.rename(os.path.join(part, src), dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
    stream = (
        spark.readStream.schema(
            "url string, url_hash long, registered_domain string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(fdir)
    )
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    query = (
        lifetime_budget_stream(stream, lifetime_budget=12)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # explicit schema: an all-empty drain leaves no part files to infer
    return spark.read.schema(
        "url string, url_hash long, registered_domain string, "
        "n_before long, lifetime_rank long"
    ).parquet(out).select(
        "url", "url_hash", "registered_domain", "lifetime_rank"
    )


@q(
    "crawl_snapshot_timetravel",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')}),
       s0 AS (SELECT * FROM frontier WHERE event_id % 3 = 0),
       s1 AS (SELECT * FROM frontier WHERE event_id % 3 <= 1)
       SELECT 0 AS snap, registered_domain, count(*) AS n_urls
       FROM s0 GROUP BY registered_domain
       UNION ALL
       SELECT 1 AS snap, registered_domain, count(*) AS n_urls
       FROM s1 GROUP BY registered_domain""",
)
def crawl_snapshot_timetravel(spark, sf):
    """Snapshot commit + time-travel scan, run for real (§2.B
    scans/sources/sinks rows): two successive frontier versions are
    COMMITTED through ``ParquetSnapshotStore`` (tmp-dir write →
    ``os.replace`` atomic manifest swap), then BOTH are read back —
    snap 0 via explicit time-travel (it is no longer ``current``),
    snap 1 via latest — and aggregated. The oracle restates the two
    versions as filters over the derived frontier, so the value hash
    pins that commit→read round-trips bytes exactly and that
    time-travel returns the historical version, not the current one."""
    import tempfile

    from .sources.snapshots import ParquetSnapshotStore

    fv = frontier_view(spark, sf)
    store = ParquetSnapshotStore(tempfile.mkdtemp(prefix="snapstore_"))
    store.commit(0, {"frontier": fv.filter(F.col("event_id") % 3 == 0)})
    store.commit(1, {"frontier": fv.filter(F.col("event_id") % 3 <= 1)})
    assert store.current() == 1
    past = store.read(spark, "frontier", snap=0)   # time-travel
    cur = store.read(spark, "frontier")            # latest
    tagged = past.withColumn("snap", F.lit(0)).unionByName(
        cur.withColumn("snap", F.lit(1))
    )
    return tagged.groupBy("snap", "registered_domain").agg(
        F.count("*").alias("n_urls")
    )


@q(
    "crawl_bloom_dedupe",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')}),
       cand AS (SELECT url, event_id AS url_hash, registered_domain
                FROM frontier),
       seen AS (SELECT event_id AS url_hash FROM frontier
                WHERE event_id % 7 = 0)
       SELECT c.registered_domain, count(*) AS n_novel,
              count(DISTINCT c.url_hash) AS n_novel_distinct
       FROM cand c
       WHERE NOT EXISTS (SELECT 1 FROM seen s
                         WHERE s.url_hash = c.url_hash)
       GROUP BY c.registered_domain""",
)
def crawl_bloom_dedupe(spark, sf):
    """The full probabilistic dedupe path (§2.B custom-agg row), with a
    FULL value oracle: per-partition bloom blobs are built from ~80% of
    the seen-set (``build_seen_blobs``), the remaining ~20% is folded in
    as a wave delta (``update_seen_blobs`` — exercising the scalable
    blob CHAIN, since the delta can overflow the newest blob), then
    every candidate is probed co-partitioned (cogroup applyInPandas)
    and bloom HITS are confirmed by the exact anti-join
    (``dedupe_against_seen(exact=True)``). A bloom MISS is
    proof-of-novelty, so the result is IDENTICAL to plain NOT EXISTS —
    which is exactly what the oracle states. Probabilistic build +
    probe + exact confirm is deterministic end-to-end."""
    from .operators.seenset import (
        build_seen_blobs,
        dedupe_against_seen,
        update_seen_blobs,
    )

    fv = frontier_view(spark, sf)
    cand = fv.select(
        "url", F.col("event_id").cast("long").alias("url_hash"),
        "registered_domain",
    )
    seen = fv.filter(F.col("event_id") % 7 == 0).select(
        F.col("event_id").cast("long").alias("url_hash")
    )
    base = seen.filter(F.col("url_hash") % 5 != 0)   # ~80% of seen
    delta = seen.filter(F.col("url_hash") % 5 == 0)  # wave delta
    blobs = build_seen_blobs(base, p=8, wave=0)
    blobs = update_seen_blobs(blobs, delta, p=8, wave=1)
    novel = dedupe_against_seen(cand, seen, blobs=blobs, p=8, exact=True)
    return novel.groupBy("registered_domain").agg(
        F.count("*").alias("n_novel"),
        F.countDistinct("url_hash").alias("n_novel_distinct"),
    )


@q(
    "crawl_extract_text",
    """SELECT event_id,
              'Page ' || CAST(event_id AS VARCHAR) || chr(10) ||
              'Event ' || CAST(event_id AS VARCHAR) || chr(10) ||
              'user ' || CAST(user_id AS VARCHAR) || ' depth ' ||
              CAST(event_id % 8 AS VARCHAR) || chr(10) ||
              'next rel' AS text,
              'https://host' || CAST(user_id % 50 AS VARCHAR)
                || '.example/e/' || CAST(event_id + 1 AS VARCHAR)
                || chr(31) || '/rel/' || CAST(event_id AS VARCHAR)
                AS outlinks
       FROM events""",
)
def crawl_extract_text(spark, sf):
    """The fetch-path mapInPandas extract kernel (§2.B UDF row), with a
    FULL value oracle: html is synthesized JVM-side from ``events`` via
    a fixed template, then the REAL single-pass extractor
    (``extract.extract_batches`` — the same kernel ``run_wave`` uses)
    produces text + outlinks. Because the extraction spec is pinned
    (extract.py module docstring), the expected output is a pure string
    function of the row, which the oracle states directly. The template
    deliberately exercises the spec: <script> subtree dropped,
    block-tag newlines (title/h1/p), whitespace-run collapse (the
    double space in the <p>), inline <a> text joining one line, and
    href capture in document order.

    The outlinks array is serialized to a chr(31)-delimited string in
    BOTH engines: the driver's comparison harness sorts pandas cells
    and cannot hash list values (CORRECTNESS_r03 err: ``unhashable
    type: 'list'``), so no registry query may output Array/Map columns
    (linted by tests/test_entry.py::test_registry_no_complex_output)."""
    from .extract import extract_batches

    e = t(spark, sf, "events")
    eid = F.col("event_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Page "), eid,
        F.lit("</title><script>var skip  = 1;</script></head>"
              "<body><h1>Event "), eid,
        F.lit("</h1><p>user "), F.col("user_id").cast("string"),
        F.lit("  depth "), F.pmod(F.col("event_id"), F.lit(8)).cast("string"),
        F.lit('</p><a href="https://host'),
        F.pmod(F.col("user_id"), F.lit(50)).cast("string"),
        F.lit(".example/e/"), (F.col("event_id") + 1).cast("string"),
        F.lit('">next</a> <a href="/rel/'), eid,
        F.lit('">rel</a></body></html>'),
    )
    docs = e.select(F.col("event_id").cast("long").alias("event_id"),
                    html.alias("html"))
    out = docs.mapInPandas(
        extract_batches,
        "event_id long, html string, text string, outlinks array<string>",
    )
    return out.select(
        "event_id", "text",
        F.concat_ws("\x1f", "outlinks").alias("outlinks"),
    )


@q(
    "stream_watermark_latedrop",
    """WITH d AS (
         SELECT event_id,
                'host' || CAST(user_id % 50 AS VARCHAR) || '.example'
                  AS registered_domain
         FROM events)
       SELECT TIMESTAMP '2024-01-01 00:00:00' AS win_start,
              registered_domain, count(*) AS n_events
       FROM d WHERE event_id < 1000 GROUP BY registered_domain
       UNION ALL
       SELECT TIMESTAMP '2024-01-01 00:20:00',
              registered_domain, count(*)
       FROM d WHERE event_id >= 1000 AND event_id <= 2000
       GROUP BY registered_domain""",
)
def stream_watermark_latedrop(spark, sf):
    """Watermark + late-data semantics (§2.B streaming rows), run for
    real and FULLY oracled. Five pinned micro-batches (mtime order +
    ``maxFilesPerTrigger=1``) drive a watermarked tumbling-window count:

    - b0: window-0 rows (ts = base + event_id%550);
    - b1: window-2 rows (base+1200+…) — advances max event time so the
      watermark (5 min delay) passes window 0's end;
    - b2: one spacer row — eviction runs one batch AFTER the watermark
      advances (probed on this Spark build), so window 0 is emitted
      HERE, containing only b0 rows;
    - b3: LATE rows aimed at the already-evicted window 0 — all dropped
      (the semantics this query pins: no duplicate window emission, no
      resurrection of closed state);
    - b4: far-future sentinel — final watermark flushes window 2 (the
      sentinel's own window stays unemitted in state).

    The oracle therefore states exactly two windows: window 0 = b0 rows
    only (late rows absent), window 2 = b1 rows + the spacer. Late rows
    (event_id 2001-2100) appear in NEITHER."""
    import os
    import tempfile

    base = 1_704_067_200  # 2024-01-01T00:00:00Z
    e = t(spark, sf, "events")
    dom = F.concat(
        F.lit("host"), F.pmod("user_id", F.lit(50)).cast("string"),
        F.lit(".example"),
    )
    eid = F.col("event_id")
    batch_no = (
        F.when(eid < 1000, 0)
        .when(eid < 2000, 1)
        .when(eid == 2000, 2)
        .when(eid <= 2100, 3)
        .otherwise(4)
    )
    off = (
        F.when(eid < 1000, F.pmod(eid, F.lit(550)))          # window 0
        .when(eid < 2000, 1200 + F.pmod(eid, F.lit(550)))    # window 2
        .when(eid == 2000, F.lit(1300))                      # spacer (w2)
        .when(eid <= 2100, F.pmod(eid, F.lit(200)))          # LATE (w0)
        .otherwise(F.lit(10_000))                            # sentinel
    )
    d = e.filter(eid <= 2101).select(
        dom.alias("registered_domain"),
        F.timestamp_seconds(F.lit(base) + off).alias("ts"),
        batch_no.alias("batch_no"),
    )
    root = tempfile.mkdtemp(prefix="latedrop_")
    fdir = os.path.join(root, "in")
    os.makedirs(fdir)
    for b in range(5):
        part = os.path.join(root, f"b{b}")
        d.filter(F.col("batch_no") == b).drop("batch_no").coalesce(
            1
        ).write.parquet(part)
        src = [f for f in os.listdir(part) if f.endswith(".parquet")][0]
        dst = os.path.join(fdir, f"batch{b}.parquet")
        os.rename(os.path.join(part, src), dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
    stream = (
        spark.readStream.schema("registered_domain string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(fdir)
    )
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(
            F.window("ts", "10 minutes").alias("win"), "registered_domain"
        )
        .agg(F.count("*").alias("n_events"))
    )
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    query = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # explicit schema: a drain that closes no window emits no files
    return spark.read.schema(
        "win struct<start:timestamp,end:timestamp>, "
        "registered_domain string, n_events long"
    ).parquet(out).select(
        F.col("win.start").alias("win_start"),
        "registered_domain",
        "n_events",
    )


@q(
    "stream_wave_schedule",
    """WITH src AS (
         SELECT CASE WHEN event_id < 1000 THEN event_id
                     WHEN event_id < 1500 THEN event_id - 1000
                     ELSE event_id - 500 END AS k,
                CASE WHEN event_id < 1000 THEN 0 ELSE 1 END AS epoch
         FROM events WHERE event_id < 2000),
       c AS (SELECT k, epoch,
                    'https://host' || CAST(k % 20 AS VARCHAR)
                      || '.example/e/' || CAST(k AS VARCHAR) AS url,
                    'host' || CAST(k % 20 AS VARCHAR) || '.example'
                      AS registered_domain,
                    CAST(k % 8 AS INTEGER) AS depth,
                    CAST(10000 - k AS DOUBLE) AS priority
             FROM src),
       e0 AS (SELECT *, row_number() OVER (
                PARTITION BY registered_domain
                ORDER BY priority DESC) AS host_rank
              FROM c WHERE epoch = 0),
       emit0 AS (SELECT * FROM e0 WHERE host_rank <= 5),
       c1 AS (SELECT * FROM c WHERE epoch = 1
              AND url NOT IN (SELECT url FROM emit0)),
       e1 AS (SELECT *, row_number() OVER (
                PARTITION BY registered_domain
                ORDER BY priority DESC) AS host_rank
              FROM c1),
       emit1 AS (SELECT * FROM e1 WHERE host_rank <= 5)
       SELECT url, registered_domain, depth, priority, host_rank,
              CAST(epoch AS INTEGER) AS epoch
       FROM emit0
       UNION ALL
       SELECT url, registered_domain, depth, priority, host_rank,
              CAST(epoch AS INTEGER) AS epoch
       FROM emit1""",
)
def stream_wave_schedule(spark, sf):
    """The streaming wave trigger (§2.B streaming surface row), run for
    real through ``run_streaming_schedule``: readStream over a frontier
    dir, ``foreachBatch`` applying the REAL batch operators
    (canonicalize → dedupe → politeness), idempotent epoch-partitioned
    sink, ``availableNow`` drain. Two pinned micro-batches
    (mtime + ``maxFilesPerTrigger=1``); epoch-1 keys 0-499 overlap
    epoch 0, and the per-domain priority order makes epoch 0 emit
    exactly the keys epoch 1 would otherwise pick — so the output
    visibly pins the CROSS-EPOCH dedupe (epoch 1's top-5 shifts to the
    next-priority keys). Priorities are distinct per domain per epoch,
    so ranks never reach the url_hash tie-break and the whole schedule
    is a pure SQL function of the input."""
    import os
    import tempfile

    from .streaming.wave_driver import run_streaming_schedule

    e = t(spark, sf, "events").filter(F.col("event_id") < 2000)
    eid = F.col("event_id")
    k = (
        F.when(eid < 1000, eid)
        .when(eid < 1500, eid - 1000)
        .otherwise(eid - 500)
    )
    epoch_no = F.when(eid < 1000, 0).otherwise(1)
    dom = F.concat(
        F.lit("host"), F.pmod(k, F.lit(20)).cast("string"), F.lit(".example")
    )
    cand = e.select(
        F.concat(F.lit("https://"), dom, F.lit("/e/"),
                 k.cast("string")).alias("url"),
        k.cast("long").alias("url_hash"),  # recomputed by canonicalized()
        dom.alias("host"),
        dom.alias("registered_domain"),
        F.pmod(k, F.lit(8)).cast("int").alias("depth"),
        (F.lit(10000) - k).cast("double").alias("priority"),
        F.lit("QUEUED").alias("state"),
        F.lit(0).alias("wave"),
        epoch_no.alias("batch_no"),
    )
    root = tempfile.mkdtemp(prefix="stream_wave_")
    fdir = os.path.join(root, "in")
    os.makedirs(fdir)
    for b in (0, 1):
        part = os.path.join(root, f"b{b}")
        cand.filter(F.col("batch_no") == b).drop("batch_no").coalesce(
            1
        ).write.parquet(part)
        src = [f for f in os.listdir(part) if f.endswith(".parquet")][0]
        dst = os.path.join(fdir, f"batch{b}.parquet")
        os.rename(os.path.join(part, src), dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    run_streaming_schedule(
        spark, fdir, out, ckpt,
        seen=None, politeness_budget=None, default_budget=5,
        max_files_per_trigger=1,
    )
    return spark.read.parquet(out).select(
        "url", "registered_domain", "depth", "priority", "host_rank",
        F.col("epoch").cast("int").alias("epoch"),
    )


@q(
    "crawl_seed_frontier",
    """WITH m AS (SELECT DISTINCT event_id % 500 AS m FROM events)
       SELECT 'https://host' || CAST(m % 20 AS VARCHAR)
                || '.example/s/' || CAST(m AS VARCHAR)
                || '?a=1&b=2' AS url,
              'host' || CAST(m % 20 AS VARCHAR) || '.example'
                AS registered_domain,
              0 AS depth, CAST(2.0 AS DOUBLE) AS priority,
              'QUEUED' AS state, 0 AS wave
       FROM m""",
)
def crawl_seed_frontier(spark, sf):
    """Seed-list source (§2.B scans/sources row), full oracle:
    ``init_frontier`` is fed ~20 mangled variants per canonical seed
    (uppercase scheme/host, default port, doubled slashes, trailing
    slash, unsorted query keys, tracker param, fragment — the exact
    non-canonical inventory ``crawl_canonicalize`` pins) and must
    collapse them to ONE frontier row each with depth 0, the pinned
    wave-0 priority (1·credit + 1·e⁰ + 0.1·log1p(0) = 2.0 exactly, in
    IEEE doubles), and state QUEUED. The oracle constructs the expected
    canonical frontier directly."""
    from .wave import init_frontier

    e = t(spark, sf, "events")
    m = F.pmod(F.col("event_id"), F.lit(500))
    raw = F.concat(
        F.lit("HTTPS://HOST"), F.pmod(m, F.lit(20)).cast("string"),
        F.lit(".Example:443/s//"), m.cast("string"),
        F.lit("/?b=2&a=1&utm_source=x#frag"),
    )
    seeds = e.select(raw.alias("url"))
    fr = init_frontier(spark, seeds)
    return fr.select(
        "url", "registered_domain", "depth", "priority", "state", "wave"
    )


@q(
    "crawl_robots_parse",
    """WITH d AS (SELECT DISTINCT user_id % 50 AS d FROM events),
       base AS (SELECT 'host' || CAST(d AS VARCHAR) || '.example' AS host,
                       d
                FROM d)
       SELECT host, 0 AS rule_order, '*' AS agent, false AS allow,
              '/e/1' AS path_prefix, CAST(d % 5 AS DOUBLE) AS crawl_delay
       FROM base
       UNION ALL
       SELECT host, 1, '*', true, '/', CAST(d % 5 AS DOUBLE) FROM base
       UNION ALL
       SELECT host, 2, 'badbot', false, '/', 0.0 FROM base
       WHERE d % 2 = 0""",
)
def crawl_robots_parse(spark, sf):
    """robots.txt TEXT parsing (§2.B mapInPandas row, "also robots.txt
    parser"), full oracle: one synthetic robots.txt body per domain —
    even domains carry a second ``badbot`` agent group — is parsed by
    the real ``parse_robots`` mapInPandas kernel (pinned mini-grammar,
    operators/robots.py) into ``robots_rules`` rows; the oracle states
    the expected rows directly. The parse is 1 file → N rules, the
    UDTF fan-out shape, with comments and the group-level Crawl-delay
    exercised."""
    from .operators.robots import parse_robots

    e = t(spark, sf, "events")
    doms = e.select(F.pmod("user_id", F.lit(50)).alias("d")).distinct()
    host = F.concat(F.lit("host"), F.col("d").cast("string"), F.lit(".example"))
    delay = F.pmod("d", F.lit(5)).cast("string")
    body = F.concat(
        F.lit("# synthetic robots\nUser-agent: *\nDisallow: /e/1\n"
              "Allow: /\nCrawl-delay: "),
        delay,
        F.when(
            F.col("d") % 2 == 0,
            F.lit("\n\nUser-agent: badbot\nDisallow: /"),
        ).otherwise(F.lit("")),
    )
    bodies = doms.select(host.alias("host"), body.alias("robots_txt"))
    return parse_robots(bodies)


@q(
    "crawl_paginate_udtf",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')})
       SELECT event_id, CAST(t.i AS INTEGER) AS page_no,
              url || '?page=' || CAST(t.i AS VARCHAR) AS page_url
       FROM frontier, unnest(range(1, 2 + event_id % 4)) AS t(i)""",
)
def crawl_paginate_udtf(spark, sf):
    """Cursor pagination as frontier fan-out (§2.A A4: "multi-page =
    multiple frontier rows"), via a REAL Spark 4 Python UDTF
    (``@udtf(useArrow=True)`` — Arrow-batched, honoring the no-per-row-
    Python input hint) applied with a LATERAL join: each url emits one
    frontier row per result page (1 + event_id % 4 pages). The oracle
    restates the fan-out as a lateral ``unnest(range(...))``. This is
    the §2.B UDTF-row primitive itself, complementing the mapInPandas
    1→N kernels (frame sampling, robots parsing)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="page_no int, page_url string", useArrow=True)
    class Paginate:
        def eval(self, url: str, n: int):
            for i in range(1, n + 1):
                yield i, f"{url}?page={i}"

    spark.udtf.register("crawl_paginate", Paginate)
    fv = frontier_view(spark, sf)
    fv.select(
        "event_id", "url",
        (1 + F.pmod("event_id", F.lit(4))).cast("int").alias("n_pages"),
    ).createOrReplaceTempView("_paginate_src")
    return spark.sql(
        "SELECT event_id, p.page_no, p.page_url "
        "FROM _paginate_src, LATERAL crawl_paginate(url, n_pages) p"
    )


@q(
    "crawl_salted_join",
    """WITH f AS (
         SELECT event_id,
                CASE WHEN event_id % 2 = 0 THEN 'host0.example'
                     ELSE 'host' || CAST(user_id % 50 AS VARCHAR)
                            || '.example' END AS registered_domain,
                value
         FROM events),
       dim AS (SELECT 'host' || CAST(d AS VARCHAR) || '.example' AS
                        registered_domain,
                      1 + d % 4 AS credit
               FROM (SELECT unnest(range(0, 50)) AS d))
       SELECT f.registered_domain, d.credit,
              count(*) AS n_rows,
              round(sum(f.value * d.credit), 4) AS weighted
       FROM f JOIN dim d USING (registered_domain)
       GROUP BY f.registered_domain, d.credit""",
)
def crawl_salted_join(spark, sf):
    """Skew-handled join via EXPLICIT salting (§2.B skew row, the
    BASELINE.json "salted repartitioning on registered-domain"
    technique), full oracle: the fact side is deliberately skewed
    (half of all rows land on host0.example — the hot-domain Zipf
    head), so a plain shuffle join would put ~50% of the data in one
    task. Instead the fact side gets ``salt = pmod(xxhash64(key),
    S)`` and the dim side is replicated ×S (explode over the salt
    range — dims are small, replication is cheap); the join key
    becomes (domain, salt), splitting the hot domain into S tasks.
    The result is provably identical to the unsalted join, which is
    exactly what the oracle states. AQE's runtime skew split
    (tools/skew_demo.py) is the optimizer-side complement; salting is
    the structural guarantee that doesn't depend on it."""
    S = 8
    e = t(spark, sf, "events")
    dom = F.when(
        F.col("event_id") % 2 == 0, F.lit("host0.example")
    ).otherwise(
        F.concat(F.lit("host"), F.pmod("user_id", F.lit(50)).cast("string"),
                 F.lit(".example"))
    )
    fact = e.select(
        "event_id", dom.alias("registered_domain"), "value"
    ).withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(S)).cast("int")
    )
    dim = spark.range(50).select(
        F.concat(F.lit("host"), F.col("id").cast("string"),
                 F.lit(".example")).alias("registered_domain"),
        (1 + F.pmod("id", F.lit(4))).cast("int").alias("credit"),
    ).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    j = fact.join(dim, ["registered_domain", "_salt"])
    return j.groupBy("registered_domain", "credit").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum(F.col("value") * F.col("credit")), 4).alias("weighted"),
    )


@q(
    "crawl_delay_schedule",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')}),
       delays AS (
         SELECT 'host' || CAST(d AS VARCHAR) || '.example' AS host,
                1.0 + (d % 5) AS delay_s
         FROM (SELECT unnest(range(0, 50)) AS d)),
       ranked AS (
         SELECT f.url, f.registered_domain, delay_s,
                row_number() OVER (PARTITION BY f.registered_domain
                                   ORDER BY f.priority DESC, f.url) AS slot
         FROM frontier f JOIN delays d ON d.host = f.host)
       SELECT url, registered_domain, slot,
              round((slot - 1) * delay_s, 1) AS fetch_at_s
       FROM ranked WHERE slot <= 6""",
)
def crawl_delay_schedule(spark, sf):
    """Crawl-delay-aware slot assignment (§2.A A5's other half): the
    politeness top-k says WHO fetches this wave; robots ``crawl_delay``
    says WHEN — slot k on a host fetches no earlier than
    (k−1)·delay seconds into the wave, which is how a wave maps onto
    wall-clock without a serial per-host loop (the reference sleeps
    between calls; the engine emits the whole schedule as data).
    Broadcast delay dim + per-domain window — bounded partitions, no
    Python."""
    fv = frontier_view(spark, sf)
    delays = fv.sparkSession.range(50).select(
        F.concat(F.lit("host"), F.col("id").cast("string"),
                 F.lit(".example")).alias("host"),
        (1.0 + F.pmod("id", F.lit(5))).alias("delay_s"),
    )
    wd = W.partitionBy("registered_domain").orderBy(
        F.desc("priority"), F.asc("url")
    )
    return (
        fv.join(F.broadcast(delays), "host")
        .withColumn("slot", F.row_number().over(wd))
        .filter(F.col("slot") <= 6)
        .select(
            "url", "registered_domain", "slot",
            F.round((F.col("slot") - 1) * F.col("delay_s"), 1).alias(
                "fetch_at_s"
            ),
        )
    )


@q(
    "crawl_fetch_schedule",
    f"""WITH {FRONTIER_CTE.strip().rstrip(')')}),
       robots AS (
         SELECT 'host' || CAST(d AS VARCHAR) || '.example' AS host,
                0 AS rule_order, true AS allow, '/' AS path_prefix,
                0.5 * (1 + d % 4) AS crawl_delay, '*' AS agent
         FROM (SELECT unnest(range(0, 50)) AS d)),
       verdict AS (
         SELECT f.*, r.crawl_delay
         FROM frontier f JOIN robots r ON r.host = f.host),
       polite AS (
         SELECT *, row_number() OVER (PARTITION BY registered_domain
                                      ORDER BY priority DESC, url) AS host_rank
         FROM verdict),
       batch AS (
         SELECT *, row_number() OVER (ORDER BY priority DESC, depth, url)
                     AS fetch_order
         FROM polite WHERE host_rank <= 5),
       sched AS (
         SELECT url, registered_domain, fetch_order, crawl_delay,
                sum(crawl_delay) OVER (PARTITION BY registered_domain
                                       ORDER BY fetch_order
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) - crawl_delay
                  AS wait_s
         FROM batch WHERE fetch_order <= 150)
       SELECT fetch_order, url, registered_domain,
              round(wait_s, 1) AS fetch_at_s
       FROM sched""",
)
def crawl_fetch_schedule(spark, sf):
    """The engine's wave step 4b (wave.py), stated as an oracled query:
    robots_verdict carries ``crawl_delay`` to the schedule, politeness
    top-k picks WHO, the global fetch order ranks the batch, and the
    per-domain slot window emits WHEN — ``fetch_at_s`` = running sum of
    the PRECEDING slots' crawl_delays (monotone in fetch order even if
    robots gives different delays to different path prefixes of one
    host; equals (slot−1)·delay when the delay is host-uniform — ADVICE
    r4). Same operator chain as ``run_wave`` (robots_verdict +
    windows); per-domain windows stay bounded by the politeness budget,
    so no skew at scale. Golden-level evidence on the ``.example``
    corpus lives in tests/test_wave.py::test_fetch_at_schedule."""
    fv = frontier_view(spark, sf)
    robots = spark.createDataFrame(
        [(f"host{d}.example", 0, True, "/", 0.5 * (1 + d % 4), "*")
         for d in range(50)],
        "host string, rule_order int, allow boolean, path_prefix string, "
        "crawl_delay double, agent string",
    )
    ruled = robots_verdict(fv, robots)
    wp = W.partitionBy("registered_domain").orderBy(
        F.desc("priority"), F.asc("url")
    )
    batch = (
        ruled.filter(F.col("robots_allowed"))
        .withColumn("host_rank", F.row_number().over(wp))
        .filter(F.col("host_rank") <= 5)
    )
    wg = W.orderBy(F.desc("priority"), F.asc("depth"), F.asc("url"))
    ordered = batch.withColumn("fetch_order", F.row_number().over(wg)).filter(
        F.col("fetch_order") <= 150
    )
    ws = (
        W.partitionBy("registered_domain")
        .orderBy("fetch_order")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ordered.select(
        "fetch_order",
        "url",
        "registered_domain",
        F.round(
            F.sum("crawl_delay").over(ws) - F.col("crawl_delay"), 1
        ).alias("fetch_at_s"),
    )


@q(
    "crawl_host_health",
    """WITH stats AS (
         SELECT 'host' || CAST(user_id % 50 AS VARCHAR) || '.example'
                  AS registered_domain,
                1 AS attempts,
                CASE WHEN (event_id + user_id) % 7 = 0 THEN 1 ELSE 0 END
                  AS failures
         FROM events)
       SELECT registered_domain,
              CAST(sum(attempts) AS BIGINT) AS attempts,
              CAST(sum(failures) AS BIGINT) AS failures,
              round(greatest(0.25,
                    1.0 - CAST(sum(failures) AS DOUBLE) / sum(attempts)), 6)
                AS health
       FROM stats GROUP BY registered_domain""",
)
def crawl_host_health(spark, sf):
    """§2.A A11 analogue (operators/health.py) as an oracled query:
    three synthetic waves of attempt/failure counters (events sliced by
    event_id % 3 — each slice plays one wave's fetch batch, with
    (event_id+user_id) % 7 rows failing) fold through the REAL
    health_stats → host_health operator chain; the oracle restates the
    windowed failure-rate floor-clamp in plain SQL."""
    from .operators.health import health_stats, host_health

    e = t(spark, sf, "events")
    dom = F.concat(
        F.lit("host"), F.pmod("user_id", F.lit(50)).cast("string"),
        F.lit(".example"),
    )
    rows = e.select(
        dom.alias("registered_domain"), "event_id", "user_id"
    )
    parts = []
    for w in range(3):
        sl = rows.filter(F.pmod("event_id", F.lit(3)) == w)
        failed = sl.filter((F.col("event_id") + F.col("user_id")) % 7 == 0)
        parts.append(health_stats(sl, failed))
    hh = host_health(parts, floor=0.25)
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    agg = allp.groupBy("registered_domain").agg(
        F.sum("attempts").alias("attempts"),
        F.sum("failures").alias("failures"),
    )
    return agg.join(hh, "registered_domain").select(
        "registered_domain", "attempts", "failures",
        F.round("health", 6).alias("health"),
    )
