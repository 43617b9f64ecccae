"""Per-host fetch-health downweight (operators/health.py — the §2.A
A11 proxy-pool-health analogue): flapping hosts lose priority."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tweetf0rm_spark.crawl import Crawl, CrawlConfig
from tweetf0rm_spark.operators.health import health_stats, host_health


def test_host_health_math(spark):
    s1 = spark.createDataFrame(
        [("a.example", 4, 0), ("b.example", 4, 2)],
        "registered_domain string, attempts long, failures long",
    )
    s2 = spark.createDataFrame(
        [("a.example", 2, 0), ("b.example", 2, 4), ("c.example", 0, 0)],
        "registered_domain string, attempts long, failures long",
    )
    got = {
        r.registered_domain: r.health
        for r in host_health([s1, s2], floor=0.25).collect()
    }
    assert got["a.example"] == 1.0
    assert got["b.example"] == 0.25  # 1 - 6/6 = 0 → clamped to floor
    assert got["c.example"] == 1.0   # zero attempts → no evidence


def test_health_stats_counts(spark):
    batch = spark.createDataFrame(
        [("a.example",), ("a.example",), ("b.example",)],
        "registered_domain string",
    )
    failed = spark.createDataFrame([("b.example",)], "registered_domain string")
    got = {
        r.registered_domain: (r.attempts, r.failures)
        for r in health_stats(batch, failed).collect()
    }
    assert got == {"a.example": (2, 0), "b.example": (1, 1)}


@pytest.fixture()
def flapping_corpus(spark):
    """Domain a.example fetches fine (a/1 links to a/2); b.example has
    NO page rows, so every fetch of it fails."""
    pages = spark.createDataFrame(
        [
            ("https://a.example/1", None,
             b'<html><body><a href="https://a.example/2">x</a></body></html>',
             "x", "en"),
            ("https://a.example/2", None,
             b"<html><body>leaf</body></html>", "leaf", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    robots = spark.createDataFrame(
        [],
        "host string, rule_order int, agent string, allow boolean, "
        "path_prefix string, crawl_delay double",
    )
    seeds = spark.createDataFrame(
        [("https://a.example/1",), ("https://b.example/1",)], "url string"
    )
    return pages, robots, seeds


def _drive(spark, flapping_corpus, use_health):
    pages, robots, seeds = flapping_corpus
    root = tempfile.mkdtemp(prefix=f"health{int(use_health)}_")
    crawl = Crawl(
        spark, root, pages, robots, None,
        CrawlConfig(use_health=use_health, max_retries=3,
                    collect_stats=False),
    )
    crawl.init(seeds)
    crawl.step()  # wave 0: a/1 + b/1 scheduled; b/1 fails
    crawl.step()  # wave 1: a/2 (new) vs b/1 (retry)
    log = (
        crawl.store.read(spark, "fetch_log", 2)
        .orderBy("fetch_order")
        .collect()
    )
    health = {
        r.registered_domain: (r.attempts, r.failures)
        for r in crawl.store.read(spark, "health", 1).collect()
    }
    persisted_priority = {
        r.registered_domain: r.priority
        for r in crawl.store.read(spark, "failed", 2).collect()
    }
    for r in crawl.store.read(spark, "frontier", 2).collect():
        persisted_priority.setdefault(r.registered_domain, r.priority)
    return log, health, persisted_priority


def test_flapping_host_priority_decays(spark, flapping_corpus):
    """With health ON, b.example's retry (base priority 2.0, the
    highest in the wave) is downweighted to 0.5 after its 1/1 failure
    rate and falls BEHIND a.example's depth-1 candidate (1.368); with
    health OFF it stays in front. The health table records the wave-0
    counters either way."""
    log_on, health_on, prio_on = _drive(spark, flapping_corpus, use_health=True)
    log_off, health_off, prio_off = _drive(
        spark, flapping_corpus, use_health=False
    )
    for health in (health_on, health_off):
        assert health["a.example"] == (1, 0)
        assert health["b.example"] == (1, 1)
    assert [r.registered_domain for r in log_on] == ["a.example", "b.example"]
    assert [r.registered_domain for r in log_off] == ["b.example", "a.example"]
    # ADVICE r4 (non-compounding): the downweight is ranking-only — the
    # retry ledger / frontier written after wave 1 carry b.example's
    # BASE priority, identical to the health-OFF run. Were the multiply
    # persisted, b's priority would decay 0.5^k per retried wave and a
    # recovered host could never climb back.
    assert prio_on == prio_off
    assert prio_on["b.example"] == pytest.approx(2.0)
