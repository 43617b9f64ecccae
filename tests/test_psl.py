"""PSL-backed registered_domain (VERDICT r1 item 9): longest-match
against a pinned mini-PSL with last-two-labels fallback; `.example`
corpus behavior unchanged."""

from pyspark.sql import functions as F

from tweetf0rm_spark.canon import registered_domain_col
from tweetf0rm_spark.psl import mini_psl, with_registered_domain

CASES = [
    # host, expected registered_domain
    ("www.foo.co.uk", "foo.co.uk"),        # 2-label public suffix
    ("a.b.example.com", "example.com"),    # 1-label suffix, deep host
    ("example.com", "example.com"),
    ("news.bbc.co.uk", "bbc.co.uk"),
    ("co.uk", "co.uk"),                    # bare suffix → degrade to host
    ("foo.com.au", "foo.com.au"),
    ("host3.example", "host3.example"),    # unknown TLD → fallback
    ("deep.sub.host3.example", "host3.example"),
    ("single", "single"),                  # no dots at all
]


def test_psl_longest_match_and_fallback(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], "host string")
    got = {
        r["host"]: r["registered_domain"]
        for r in with_registered_domain(df, psl=mini_psl(spark)).collect()
    }
    for host, want in CASES:
        assert got[host] == want, (host, got[host], want)


def test_psl_none_matches_canon_expression(spark):
    """psl=None must agree exactly with canon.registered_domain_col."""
    df = spark.createDataFrame([(h,) for h, _ in CASES], "host string")
    a = with_registered_domain(df).select("host", "registered_domain")
    b = df.select(
        "host", registered_domain_col(F.col("host")).alias("registered_domain")
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_psl_example_corpus_unchanged(spark):
    """On `*.example` hosts the PSL path falls back to last-two-labels
    — crawl queries are unchanged by enabling the PSL."""
    hosts = [(f"host{i}.example",) for i in range(40)] + [
        (f"deep{i}.host{i}.example",) for i in range(40)
    ]
    df = spark.createDataFrame(hosts, "host string")
    a = with_registered_domain(df, psl=mini_psl(spark))
    b = with_registered_domain(df, psl=None)
    assert a.select("host", "registered_domain").exceptAll(
        b.select("host", "registered_domain")
    ).count() == 0


def test_psl_join_is_broadcast(spark):
    df = spark.createDataFrame([("www.foo.co.uk",)], "host string")
    plan = (
        with_registered_domain(df, psl=mini_psl(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
