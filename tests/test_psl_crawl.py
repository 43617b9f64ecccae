"""Crawl-level PSL pins (VERDICT r3 "Next round" #8): a multi-label-TLD
fixture (co.uk / com.au / *.ck / !www.ck hosts) driven through the REAL
engine with ``use_psl=True``, with a recorded golden trace — the PSL
path previously had only unit-level evidence (test_psl.py), while the
`.example` goldens never leave the last-two-labels fallback.

The fixture is built so the PSL-vs-fallback difference is *behavioral*:
the politeness budget is keyed by the true registrant (foo.co.uk,
x.a.ck), so with the PSL ON sibling hosts share one budget slot and
defer each other across waves; the fallback path would key them under
co.uk / a.ck and never find the budget row.
"""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tweetf0rm_spark.crawl import Crawl, CrawlConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "psl_trace.json")

#: seed url → PSL registered domain (hand-derived from the mini-PSL:
#: co.uk + com.au normal rules, *.ck wildcard, !www.ck exception)
SEED_RD = {
    "https://shop.foo.co.uk/p1": "foo.co.uk",
    "https://news.foo.co.uk/p1": "foo.co.uk",
    "https://bar.com.au/p1": "bar.com.au",
    "https://b.x.a.ck/p1": "x.a.ck",
    "https://c.x.a.ck/p1": "x.a.ck",
    # !www.ck: the exception strips its leading label, so the public
    # suffix is "ck" and the registrant of sub.www.ck is www.ck
    "https://sub.www.ck/p1": "www.ck",
}


def _psl_corpus(spark):
    pages = spark.createDataFrame(
        [
            (u, None, f"<html><body>page {u}</body></html>".encode(),
             f"page {u}", "en")
            for u in SEED_RD
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    robots = spark.createDataFrame(
        [],
        "host string, rule_order int, agent string, allow boolean, "
        "path_prefix string, crawl_delay double",
    )
    budget = spark.createDataFrame(
        [("foo.co.uk", 1), ("x.a.ck", 1)],
        "registered_domain string, max_per_wave int",
    )
    seeds = spark.createDataFrame([(u,) for u in SEED_RD], "url string")
    return pages, robots, budget, seeds


def drive_psl_crawl(spark):
    pages, robots, budget, seeds = _psl_corpus(spark)
    crawl = Crawl(
        spark, tempfile.mkdtemp(prefix="pslcrawl_"), pages, robots, budget,
        CrawlConfig(use_psl=True, collect_stats=False),
    )
    crawl.init(seeds)
    crawl.step()
    crawl.step()
    waves = []
    for snap in (1, 2):
        log = (
            crawl.store.read(spark, "fetch_log", snap)
            .orderBy("fetch_order")
            .collect()
        )
        waves.append([(r.url, r.registered_domain) for r in log])
    return waves


def test_psl_registrant_budget_grouping(spark):
    """Sibling hosts under one registrant share ONE politeness slot:
    wave 0 fetches exactly one of {shop,news}.foo.co.uk and one of
    {b,c}.x.a.ck; wave 1 fetches the deferred siblings. Every scheduled
    row carries the full-PSL registered_domain."""
    waves = drive_psl_crawl(spark)
    for wave in waves:
        for url, rd in wave:
            assert rd == SEED_RD[url], (url, rd)
    w0 = {u for u, _ in waves[0]}
    w1 = {u for u, _ in waves[1]}
    foo = {u for u in SEED_RD if SEED_RD[u] == "foo.co.uk"}
    ck = {u for u in SEED_RD if SEED_RD[u] == "x.a.ck"}
    assert len(w0 & foo) == 1 and len(w1 & foo) == 1
    assert len(w0 & ck) == 1 and len(w1 & ck) == 1
    # unconstrained registrants all go in wave 0
    assert "https://bar.com.au/p1" in w0
    assert "https://sub.www.ck/p1" in w0
    assert w0 | w1 == set(SEED_RD) and not (w0 & w1)


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden not recorded")
def test_psl_crawl_golden_trace(spark):
    """Exact recorded trace (tools/record_psl_golden.py): any diff is a
    golden-breaking event — either a regression in the PSL join path or
    a deliberate ordering/spec change (re-record + explain)."""
    with open(GOLDEN) as f:
        want = json.load(f)
    got = [[list(pair) for pair in wave] for wave in drive_psl_crawl(spark)]
    assert got == want
