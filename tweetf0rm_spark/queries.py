"""Oracle-checked query registry (SURVEY.md §2.B) — relational core.

Every entry pairs a DataFrame-API implementation with an ANSI-SQL
oracle DuckDB runs on the same parquet (driver contract,
``__spark_entry__.py``). Conventions that make the value-hash match:

- **identical column names** both sides (alias everything computed);
- **exact aggregation**: double sums go through ``decimal(28,6)``
  (order-independent) then cast back to double — bit-identical across
  engines regardless of partial-agg order;
- **no raw timestamps** in output — ``unix_timestamp``/``epoch`` as
  bigint;
- **transcendental outputs rounded** to 6 dp (libm implementations may
  differ by 1 ulp between JVM and DuckDB);
- per-row ``+ - * /`` arithmetic is IEEE-exact on both engines and
  needs no rounding.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


@dataclass
class Q:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver records rows-only check


def t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf, f"{name}.parquet"))


def dsum(c, alias: str):
    """Order-independent exact sum of a double column (see module doc)."""
    return F.sum(c.cast("decimal(28,6)")).cast("double").alias(alias)


REL: dict[str, Q] = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        REL[name] = Q(fn, oracle)
        return fn
    return deco


# ---------------------------------------------------------------- scans

@q(
    "scan_project_filter",
    """SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1 - l_discount) AS net
       FROM lineitem
       WHERE l_shipdate < TIMESTAMP '1996-01-01'
         AND l_quantity BETWEEN 5 AND 30""",
)
def scan_project_filter(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-01-01")))
        & F.col("l_quantity").between(5, 30)
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )


@q(
    "filter_in_like_null",
    """SELECT p_partkey, p_name
       FROM part
       WHERE p_size IN (5, 10, 15) AND p_name LIKE '%a%'
         AND p_brand IS NOT NULL""",
)
def filter_in_like_null(spark, sf):
    p = t(spark, sf, "part")
    return p.filter(
        F.col("p_size").isin(5, 10, 15)
        & F.col("p_name").like("%a%")
        & F.col("p_brand").isNotNull()
    ).select("p_partkey", "p_name")


@q(
    "case_when",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice >= 300000 THEN 'big'
                   WHEN o_totalprice >= 100000 THEN 'mid'
                   ELSE 'small' END AS size_class,
              coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status
       FROM orders""",
)
def case_when(spark, sf):
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "big")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status"
        ),
    )


# ---------------------------------------------------------------- joins

@q(
    "join_inner_agg",
    """SELECT n_name,
              CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
              count(*) AS n_orders
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name""",
)
def join_inner_agg(spark, sf):
    o, c, n = t(spark, sf, "orders"), t(spark, sf, "customer"), t(spark, sf, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(F.col("o_totalprice"), "revenue"), F.count("*").alias("n_orders"))
    )


@q(
    "join_broadcast_dim",
    """SELECT r_name, count(*) AS n_suppliers,
              CAST(sum(CAST(s_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
       FROM supplier
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name""",
)
def join_broadcast_dim(spark, sf):
    s, n, r = t(spark, sf, "supplier"), t(spark, sf, "nation"), t(spark, sf, "region")
    dim = F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey))
    return (
        s.join(dim, s.s_nationkey == dim.n_nationkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_suppliers"), dsum(F.col("s_acctbal"), "total_bal"))
    )


@q(
    "join_left_nulls",
    """SELECT c_custkey, count(o_orderkey) AS n_orders
       FROM customer
       LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
         ON c_custkey = o_custkey
       GROUP BY c_custkey
       HAVING count(o_orderkey) = 0""",
)
def join_left_nulls(spark, sf):
    """Left join + null-aware count — filtered right side so the
    HAVING=0 set is NON-empty at sf0.01 (203 rows; the unfiltered
    variant was vacuously green — every customer has an order)."""
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") == 0)
    )


@q(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
)
def join_semi(spark, sf):
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@q(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_totalprice > 400000)""",
)
def join_anti(spark, sf):
    """Left anti join — complement of ``join_semi`` (202 rows at
    sf0.01; the unfiltered variant was vacuously 0-row)."""
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@q(
    "join_full_outer",
    """SELECT coalesce(c.nk, s.nk) AS nationkey,
              coalesce(c.n_cust, 0) AS n_cust,
              coalesce(s.n_supp, 0) AS n_supp
       FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
             FROM customer GROUP BY c_nationkey) c
       FULL OUTER JOIN
            (SELECT s_nationkey AS nk, count(*) AS n_supp
             FROM supplier GROUP BY s_nationkey) s
       USING (nk)""",
)
def join_full_outer(spark, sf):
    c = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    j = c.join(s, "nk", "full_outer")
    return j.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@q(
    "join_range_bucket",
    """SELECT b.label, count(*) AS n,
              CAST(sum(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS total
       FROM events e
       JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 200.0, 'mid'),
                    (200.0, 1000000.0, 'high')) AS b(lo, hi, label)
         ON e.value >= b.lo AND e.value < b.hi
       GROUP BY b.label""",
)
def join_range_bucket(spark, sf):
    e = t(spark, sf, "events")
    b = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 200.0, "mid"), (200.0, 1000000.0, "high")],
        "lo double, hi double, label string",
    )
    return (
        e.join(F.broadcast(b), (e.value >= b.lo) & (e.value < b.hi))
        .groupBy("label")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "total"))
    )


@q(
    "join_asof",
    """SELECT p.event_id, CAST(floor(epoch(v.ts)) AS BIGINT) AS view_epoch
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
         ON p.user_id = v.user_id AND v.ts <= p.ts""",
)
def join_asof(spark, sf):
    e = t(spark, sf, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    # as-of = inequality join + max() per left row (SURVEY.md §2.B)
    j = p.join(v, (p.user_id == v.v_user) & (v.v_ts <= p.p_ts), "inner")
    return j.groupBy("event_id").agg(
        F.unix_timestamp(F.max("v_ts")).alias("view_epoch")
    )


# ----------------------------------------------------------- aggregation

@q(
    "tpch_q1_pricing",
    """SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base,
              CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc,
              CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
              count(*) AS n
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1_pricing(spark, sf):
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_base"),
        dsum(disc, "sum_disc"),
        dsum(disc * (1 + F.col("l_tax")), "sum_charge"),
        F.count("*").alias("n"),
    )


@q(
    "agg_count_distinct",
    """SELECT l_returnflag,
              count(DISTINCT l_partkey) AS n_parts,
              count(DISTINCT l_suppkey) AS n_supps
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_count_distinct(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@q(
    "agg_rollup",
    """SELECT l_returnflag, l_linestatus, count(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def agg_rollup(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


@q(
    "agg_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def agg_cube(spark, sf):
    return (
        t(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@q(
    "agg_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""",
)
def agg_grouping_sets(spark, sf):
    t(spark, sf, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM _gs_orders
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"""
    )


@q(
    "agg_collect_sorted",
    """SELECT l_returnflag,
              array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_collect_sorted(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
                "statuses"
            )
        )
    )


@q(
    "agg_approx_distinct",
    # The sketch value itself is engine-specific, so the hash-matchable
    # contract is the tolerance VERDICT: Spark emits whether the HLL++
    # estimate falls within 3·rsd of the exact distinct count; the
    # oracle compares exact to exact, which is within tolerance by
    # definition. A broken sketch (>6% off) flips within_tol to false
    # and the row hash-mismatches — a real check, not a carve-out.
    """SELECT l_returnflag,
              count(DISTINCT l_partkey) AS exact_parts,
              TRUE AS within_tol
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_approx_distinct(spark, sf):
    rsd = 0.02
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
            F.count_distinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= F.lit(3 * rsd) * F.col("exact_parts")
            ).alias("within_tol"),
        )
    )


@q(
    "agg_pivot",
    """SELECT user_id,
              count(*) FILTER (event_type = 'view') AS view,
              count(*) FILTER (event_type = 'click') AS click,
              count(*) FILTER (event_type = 'purchase') AS purchase
       FROM events GROUP BY user_id""",
)
def agg_pivot(spark, sf):
    return (
        t(spark, sf, "events")
        .groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase"])
        .count()
        .fillna(0, subset=["view", "click", "purchase"])
    )


# ---------------------------------------------------------------- window

@q(
    "window_topk_per_group",
    """SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
         SELECT c_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders JOIN customer ON o_custkey = c_custkey)
       WHERE rn <= 3""",
)
def window_topk_per_group(spark, sf):
    o, c = t(spark, sf, "orders"), t(spark, sf, "customer")
    w = W.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@q(
    "window_lag_gap",
    """SELECT event_id,
              CAST(floor(epoch(ts)) AS BIGINT)
                - lag(CAST(floor(epoch(ts)) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
       FROM events""",
)
def window_lag_gap(spark, sf):
    e = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    return e.select("event_id", (ep - F.lag(ep).over(w)).alias("gap_s"))


@q(
    "window_running_sum",
    """SELECT event_id,
              CAST(sum(CAST(value AS DECIMAL(28,6)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS running_value
       FROM events""",
)
def window_running_sum(spark, sf):
    e = t(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@q(
    "window_ntile",
    """SELECT tile, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
       FROM (SELECT o_totalprice,
                    ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
             FROM orders)
       GROUP BY tile""",
)
def window_ntile(spark, sf):
    o = t(spark, sf, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(4).over(w).alias("tile"))
        .groupBy("tile")
        .agg(F.count("*").alias("n"), dsum(F.col("o_totalprice"), "total"))
    )


# ------------------------------------------------------------ sort/limit

@q(
    "topk_global",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
)
def topk_global(spark, sf):
    return (
        t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


# -------------------------------------------------------------- set ops

@q(
    "set_union_all",
    """SELECT o_orderkey AS k, 'big' AS src FROM orders WHERE o_totalprice > 400000
       UNION ALL
       SELECT o_orderkey AS k, 'early' AS src FROM orders
       WHERE o_orderdate < TIMESTAMP '1995-06-01'""",
)
def set_union_all(spark, sf):
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("k"), F.lit("big").alias("src")
    )
    b = o.filter(F.col("o_orderdate") < F.to_timestamp(F.lit("1995-06-01"))).select(
        F.col("o_orderkey").alias("k"), F.lit("early").alias("src")
    )
    return a.unionByName(b)


@q(
    "set_intersect",
    """SELECT c_nationkey AS nk FROM customer
       INTERSECT
       SELECT s_nationkey AS nk FROM supplier""",
)
def set_intersect(spark, sf):
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@q(
    "set_except",
    """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_totalprice > 450000""",
)
def set_except(spark, sf):
    """EXCEPT with a NON-empty result (336 rows at sf0.01): customers
    whose largest order lands in (400k, 450k]. The old nation-minus-
    supplier-nation shape was vacuously 0-row."""
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 450000).select("o_custkey")
    return a.subtract(b)  # EXCEPT DISTINCT semantics, matches the oracle


# ------------------------------------------------------- scalar families

@q(
    "string_funcs",
    """SELECT p_partkey,
              lower(p_name) AS lname,
              trim(p_name) AS tname,
              length(p_name) AS name_len,
              substring(p_name, 1, 5) AS name5,
              split_part(p_name, ' ', 1) AS first_word,
              concat_ws('|', p_brand, p_type) AS brand_type,
              replace(p_type, 'a', '_') AS repl
       FROM part""",
)
def string_funcs(spark, sf):
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.trim("p_name").alias("tname"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.split(F.col("p_name"), " ")[0].alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", "a", "_").alias("repl"),
    )


@q(
    "datetime_funcs",
    """SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch,
              CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
              count(*) AS n,
              CAST(max(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)) AS BIGINT)
                AS max_days_since
       FROM orders
       GROUP BY 1, 2""",
)
def datetime_funcs(spark, sf):
    o = t(spark, sf, "orders")
    return o.groupBy(
        F.unix_timestamp(F.date_trunc("month", "o_orderdate")).alias("month_epoch"),
        F.year("o_orderdate").alias("yr"),
    ).agg(
        F.count("*").alias("n"),
        F.max(
            F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1995-01-01")))
        ).cast("long").alias("max_days_since"),
    )


@q(
    "math_funcs",
    """SELECT event_id,
              round(ln(1.0 + value), 6) AS log_val,
              round(sqrt(value), 6) AS sqrt_val,
              greatest(value, 100.0) AS hi,
              least(value, 100.0) AS lo,
              abs(value - 100.0) AS dist,
              CAST(floor(value / 10.0) AS BIGINT) AS bucket
       FROM events""",
)
def math_funcs(spark, sf):
    e = t(spark, sf, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(F.log(F.lit(1.0) + v), 6).alias("log_val"),
        F.round(F.sqrt(v), 6).alias("sqrt_val"),
        F.greatest(v, F.lit(100.0)).alias("hi"),
        F.least(v, F.lit(100.0)).alias("lo"),
        F.abs(v - 100.0).alias("dist"),
        F.floor(v / 10.0).cast("long").alias("bucket"),
    )


@q(
    "json_funcs",
    """SELECT event_id,
              CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
       FROM events""",
)
def json_funcs(spark, sf):
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@q(
    "hash_funcs",
    """SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS key_md5
       FROM orders""",
)
def hash_funcs(spark, sf):
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.md5(F.col("o_orderkey").cast("string")).alias("key_md5"),
    )


@q(
    "array_funcs",
    """SELECT p_partkey,
              len(string_split(p_name, ' ')) AS n_words,
              array_to_string(list_sort(list_distinct(
                  string_split(p_name, ' '))), ',') AS sorted_words,
              list_contains(string_split(p_name, ' '), 'green') AS has_green,
              array_to_string(list_slice(string_split(p_name, ' '), 1, 2), ' ')
                AS first_two
       FROM part""",
)
def array_funcs(spark, sf):
    p = t(spark, sf, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_join(F.sort_array(F.array_distinct(words)), ",").alias(
            "sorted_words"
        ),
        F.array_contains(words, "green").alias("has_green"),
        F.array_join(F.slice(words, 1, 2), " ").alias("first_two"),
    )


@q(
    "array_explode_wordcount",
    """SELECT word, count(*) AS n
       FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
       GROUP BY word""",
)
def array_explode_wordcount(spark, sf):
    p = t(spark, sf, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@q(
    "map_funcs",
    """SELECT p_partkey,
              array_to_string(map_keys(
                  map {p_brand: p_type, 'size': CAST(p_size AS VARCHAR)}), ',')
                AS mkeys,
              array_to_string(map_values(
                  map {p_brand: p_type, 'size': CAST(p_size AS VARCHAR)}), ',')
                AS mvals
       FROM part""",
)
def map_funcs(spark, sf):
    p = t(spark, sf, "part")
    m = F.create_map(
        F.col("p_brand"), F.col("p_type"),
        F.lit("size"), F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), ",").alias("mvals"),
    )


@q(
    "binary_funcs",
    """SELECT doc_id,
              octet_length(encode(text)) AS n_bytes,
              to_base64(encode(substr(text, 1, 12))) AS head_b64,
              md5(text) AS text_md5
       FROM documents""",
)
def binary_funcs(spark, sf):
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.length(F.encode("text", "utf-8")).cast("int").alias("n_bytes"),
        F.base64(F.encode(F.substring("text", 1, 12), "utf-8")).alias("head_b64"),
        F.md5(F.col("text")).alias("text_md5"),
    )


@q(
    "window_percent_first_last",
    """SELECT o_orderkey,
              round(percent_rank() OVER
                    (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey), 6) AS pr,
              first_value(o_orderkey) OVER
                    (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS cheapest,
              last_value(o_orderkey) OVER
                    (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS priciest
       FROM orders""",
)
def window_percent_first_last(spark, sf):
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.first("o_orderkey").over(wf).alias("cheapest"),
        F.last("o_orderkey").over(wf).alias("priciest"),
    )


@q(
    "string_funcs2",
    """SELECT p_partkey,
              split_part(p_type, ' ', -1) AS last_word,
              translate(p_brand, '#', '-') AS brand_dash,
              lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
              reverse(p_name) AS rname,
              CAST(strpos(p_name, 'a') AS INTEGER) AS a_pos,
              repeat(p_brand, 2) AS brand2
       FROM part""",
)
def string_funcs2(spark, sf):
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.substring_index("p_type", " ", -1).alias("last_word"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.reverse("p_name").alias("rname"),
        F.instr(F.col("p_name"), "a").cast("int").alias("a_pos"),
        F.repeat("p_brand", 2).alias("brand2"),
    )


@q(
    "json_struct_funcs",
    """SELECT event_id,
              CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
              json_extract_string(props, '$.source') AS source,
              CAST(json_valid(props) AS BOOLEAN) AS is_valid
       FROM events""",
)
def json_struct_funcs(spark, sf):
    e = t(spark, sf, "events")
    parsed = F.from_json(
        "props", "k bigint, source string"
    )
    return e.select(
        "event_id",
        parsed["k"].alias("k_val"),
        parsed["source"].alias("source"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@q(
    "array_posexplode_zip",
    """SELECT p_partkey,
              string_split(p_name, ' ')[i + 1] AS word,
              CAST(i AS INTEGER) AS pos
       FROM part,
            LATERAL (SELECT unnest(range(len(string_split(p_name, ' '))))
                     AS i)""",
)
def array_posexplode_zip(spark, sf):
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split("p_name", " ")).alias("pos", "word"),
    ).select("p_partkey", "word", F.col("pos").cast("int").alias("pos"))


@q(
    "agg_percentile",
    """SELECT o_orderstatus,
              round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
              round(quantile_cont(o_totalprice, 0.9), 6) AS p90
       FROM orders GROUP BY o_orderstatus""",
)
def agg_percentile(spark, sf):
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
    )


@q(
    "set_union_distinct",
    """SELECT c_nationkey AS nk FROM customer
       UNION
       SELECT s_nationkey AS nk FROM supplier""",
)
def set_union_distinct(spark, sf):
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()
