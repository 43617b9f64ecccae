"""Fetch-failure retry (§2.A A12): failed urls are re-injected as
RETRY rows under a bounded ledger; successes are never re-fetched."""

import collections
import tempfile

import pytest

from tweetf0rm_spark.crawl import Crawl, CrawlConfig


@pytest.fixture(scope="module")
def retry_crawl(spark, corpus_dfs):
    cr = Crawl(
        spark, tempfile.mkdtemp(prefix="retry_store_"),
        corpus_dfs["pages"], corpus_dfs["robots_rules"],
        corpus_dfs["politeness_budget"],
        CrawlConfig(batch_size=120, max_retries=2),
    )
    cr.init(corpus_dfs["seeds"])
    cr.run(max_waves=5)
    return cr


def _fetch_counts(spark, cr):
    snap = cr.store.current()
    counts, dead = collections.Counter(), set()
    for s in range(1, snap + 1):
        for r in cr.store.read(spark, "fetch_log", s).collect():
            counts[r.url] += 1
        dead |= {
            r.url
            for r in cr.store.read(spark, "pages_delta", s)
            .filter("text is null")
            .collect()
        }
    return counts, dead


def test_only_failures_are_refetched(retry_crawl, spark):
    counts, dead = _fetch_counts(spark, retry_crawl)
    multi = {u for u, c in counts.items() if c > 1}
    assert multi <= dead, "a successful fetch was re-attempted"


def test_attempts_bounded_by_max_retries(retry_crawl, spark):
    counts, _ = _fetch_counts(spark, retry_crawl)
    # 1 first attempt + max_retries re-attempts
    assert max(counts.values()) <= 1 + 2


def test_ledger_counts_failed_attempts(retry_crawl, spark):
    snap = retry_crawl.store.current()
    rows = retry_crawl.store.read(spark, "failed", snap).collect()
    assert all(1 <= r.retries <= 3 for r in rows)
    # ledger urls are a subset of the dead set
    _, dead = _fetch_counts(spark, retry_crawl)
    assert {r.url for r in rows} <= dead


def test_retry_count_survives_deferral(spark):
    """A failed url whose re-attempt is DEFERRED by politeness must keep
    its ledger count (it was never attempted); previously the ledger was
    rebuilt from this wave's failures only, so the count reset to 1 on
    the next failure and a dead url on a contended domain could
    alternate fail/defer past max_retries forever."""
    pages = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, "
            "lang string"
    )
    robots = spark.createDataFrame(
        [], "host string, rule_order int, agent string, allow boolean, "
            "path_prefix string, crawl_delay double"
    )
    seeds = spark.createDataFrame(
        [("http://www.dead.example/a",)], "url string"
    )
    bschema = "registered_domain string, max_per_wave int"
    open_b = spark.createDataFrame([("dead.example", 5)], bschema)
    shut_b = spark.createDataFrame([("dead.example", 0)], bschema)
    store = tempfile.mkdtemp(prefix="retry_defer_")
    cfg = CrawlConfig(max_retries=2)

    def step(budget):
        c = Crawl(spark, store, pages, robots, budget, cfg)
        if c.store.current() < 0:
            c.init(seeds)
        out = c.step()
        snap = c.store.current()
        ledger = {
            r.url: r.retries
            for r in c.store.read(spark, "failed", snap).collect()
        }
        return ledger, out["fetched"]

    led1, n1 = step(open_b)   # attempt 1 fails
    assert led1 == {"http://www.dead.example/a": 1} and n1 == 1
    led2, n2 = step(shut_b)   # re-attempt deferred by budget 0
    assert n2 == 0
    assert led2 == {"http://www.dead.example/a": 1}, (
        "ledger row dropped while its RETRY re-attempt was deferred"
    )
    led3, n3 = step(open_b)   # attempt 2 fails — count must INCREMENT
    assert led3 == {"http://www.dead.example/a": 2} and n3 == 1
    led4, n4 = step(shut_b)   # deferred again
    assert n4 == 0 and led4 == {"http://www.dead.example/a": 2}
    led5, n5 = step(open_b)   # attempt 3 = 1 + max_retries → exhausted
    assert n5 == 1 and led5.get("http://www.dead.example/a") == 3
    led6, n6 = step(open_b)   # nothing left to fetch, ledger drains
    assert n6 == 0 and led6 == {}


def test_retry_rows_respect_politeness(retry_crawl, spark):
    budgets = {
        r.registered_domain: r.max_per_wave
        for r in retry_crawl.budget.collect()
    }
    snap = retry_crawl.store.current()
    for s in range(1, snap + 1):
        cnt = collections.Counter(
            r.registered_domain
            for r in retry_crawl.store.read(spark, "fetch_log", s).collect()
        )
        for dom, n in cnt.items():
            assert n <= budgets.get(dom, 32), (s, dom, n)
