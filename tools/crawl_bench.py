#!/usr/bin/env python
"""End-to-end crawl-loop benchmark: the full ``Crawl`` driver
(init → wave⁺) over a generated corpus, including snapshot commits,
Arrow fetch+extract, BFS expansion, and seen-set filter rebuilds.

This complements bench.py's per-stage numbers with the figure a crawl
operator actually cares about: sustained pages fetched+extracted/sec
and URLs scheduled/sec across waves, with all state durably committed
between waves (the resume guarantee is not free — this measures its
cost too).

Usage: python tools/crawl_bench.py [n_pages] [waves]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tweetf0rm_spark.crawl import Crawl, CrawlConfig  # noqa: E402
from tweetf0rm_spark.datagen import write_corpus  # noqa: E402
from tweetf0rm_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_domains = max(20, n_pages // 100)

    corpus_dir = tempfile.mkdtemp(prefix="crawl-bench-corpus-")
    store_dir = tempfile.mkdtemp(prefix="crawl-bench-store-")
    t0 = time.time()
    write_corpus(corpus_dir, n_pages=n_pages, n_domains=n_domains,
                 n_seeds=min(128, n_domains))
    gen_sec = time.time() - t0

    spark = get_spark("crawl-bench")
    rd = lambda n: spark.read.parquet(os.path.join(corpus_dir, f"{n}.parquet"))
    crawl = Crawl(
        spark, store_dir, rd("pages"), rd("robots_rules"),
        rd("politeness_budget"),
        CrawlConfig(default_budget=256),
    )
    crawl.init(rd("seeds"))

    # per-wave timing: with the append-only seen-delta + incremental
    # blob update, wave cost must track the DELTA (fetch batch), not
    # the accumulated corpus — the figure that proves the incremental
    # seen-set path (per_wave[i].sec should flatten, not grow, as the
    # seen set accumulates across waves)
    stats = []
    t0 = time.time()
    for _ in range(waves):
        tw = time.time()
        s = crawl.step()
        s["sec"] = round(time.time() - tw, 2)
        stats.append(s)
        if s.get("fetched") == 0:
            break
    crawl_sec = time.time() - t0

    fetched = sum(s["fetched"] for s in stats)
    scheduled = fetched + int(
        crawl.store.read(spark, "frontier").count()
    )
    out = {
        "n_pages": n_pages,
        "waves_run": len(stats),
        "fetched_total": fetched,
        "corpus_gen_sec": round(gen_sec, 2),
        "crawl_sec": round(crawl_sec, 2),
        "pages_per_sec": round(fetched / crawl_sec, 1),
        "per_wave": stats,
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(corpus_dir, ignore_errors=True)
    shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
