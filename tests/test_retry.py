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
