"""Operator semantics: politeness two-phase exactness, robots rules,
seen-set bloom-path equivalence, dedupe_within determinism."""

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tweetf0rm_spark.datagen import gen_frontier_df
from tweetf0rm_spark.operators.dedupe import anti_join_seen, dedupe_within
from tweetf0rm_spark.operators.politeness import politeness_rank
from tweetf0rm_spark.operators.robots import robots_verdict
from tweetf0rm_spark.operators.seenset import build_seen_blobs, dedupe_against_seen


def test_politeness_two_phase_equals_naive_window(spark):
    """The salted two-phase top-k must select EXACTLY the same rows as
    the naive (skew-prone) single window — exactness claim of
    operators/politeness.py."""
    fr = gen_frontier_df(spark, 20_000, n_domains=50, n_partitions=8)
    ranked = politeness_rank(fr, None, n_salts=8, default_budget=10)
    fast = ranked.filter("within_budget").select("url")

    w = W.partitionBy("registered_domain").orderBy(
        F.desc("priority"), F.asc("depth"), F.asc("url_hash")
    )
    naive = (
        fr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("url")
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


def test_politeness_budget_respected(spark):
    fr = gen_frontier_df(spark, 5_000, n_domains=10, n_partitions=4)
    budget = spark.createDataFrame(
        [(f"site{i:05d}.example", 1 + i % 3) for i in range(12)],
        "registered_domain string, max_per_wave int",
    )
    ranked = politeness_rank(fr, budget, n_salts=4)
    got = (
        ranked.filter("within_budget")
        .groupBy("registered_domain")
        .agg(F.count("*").alias("n"), F.max("max_per_wave").alias("b"))
        .filter(F.col("n") > F.col("b"))
    )
    assert got.count() == 0


def test_robots_first_matching_rule_wins(spark):
    rules = spark.createDataFrame(
        [
            ("h.example", 0, False, "/private", 0.0, "*"),
            ("h.example", 1, True, "/", 0.0, "*"),
            ("open.example", 0, True, "/", 1.5, "*"),
            ("closed.example", 0, False, "/", 0.0, "*"),
            ("ignored.example", 0, False, "/", 0.0, "googlebot"),
        ],
        "host string, rule_order int, allow boolean, path_prefix string, "
        "crawl_delay double, agent string",
    )
    cand = spark.createDataFrame(
        [
            ("https://h.example/private/x", "h.example"),
            ("https://h.example/public", "h.example"),
            ("https://open.example/anything", "open.example"),
            ("https://closed.example/anything", "closed.example"),
            ("https://norules.example/x", "norules.example"),
            ("https://ignored.example/x", "ignored.example"),
        ],
        "url string, host string",
    )
    out = {r.url: (r.robots_allowed, r.crawl_delay)
           for r in robots_verdict(cand, rules).collect()}
    assert out["https://h.example/private/x"][0] is False
    assert out["https://h.example/public"][0] is True
    assert out["https://open.example/anything"] == (True, 1.5)
    assert out["https://closed.example/anything"][0] is False
    assert out["https://norules.example/x"][0] is True   # no rules ⇒ allow
    assert out["https://ignored.example/x"][0] is True   # non-* agent ignored


def test_seenset_bloom_path_equals_exact(spark):
    df = spark.range(0, 30_000).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("payload")
    )
    seen = df.filter(F.col("payload") % 7 < 3).select("url_hash")
    blobs = build_seen_blobs(seen, p=8)
    exact = dedupe_against_seen(df, seen).select("url_hash")
    fast = dedupe_against_seen(df, seen, blobs, p=8, exact=True).select("url_hash")
    assert exact.exceptAll(fast).count() == 0
    assert fast.exceptAll(exact).count() == 0


def test_anti_join_seen(spark):
    cand = spark.createDataFrame([(1,), (2,), (3,)], "url_hash long")
    seen = spark.createDataFrame([(2,), (2,), (4,)], "url_hash long")
    out = {r.url_hash for r in anti_join_seen(cand, seen).collect()}
    assert out == {1, 3}


def test_dedupe_within_picks_min_depth(spark):
    df = spark.createDataFrame(
        [(10, "https://a.example/x", 3), (10, "https://a.example/x", 1),
         (20, "https://b.example/y", 2)],
        "url_hash long, url string, depth int",
    )
    out = {r.url_hash: r.depth
           for r in dedupe_within(df, order_cols=("depth", "url")).collect()}
    assert out == {10: 1, 20: 2}
