"""Record golden traces (FIXTURES.md §E) — run ONCE, commit the output.

Runs the crawl driver on the deterministic golden corpus and freezes:
  trace_waves.jsonl  per wave: ordered fetched urls (crawl-order invariant)
  seen_final.txt     sorted final canonical url list (URL-seen invariant)
  text_md5.tsv       url \\t md5(text) per fetched url (byte-identity)
  lineage.jsonl      per (wave, domain) counters

Any diff in a later run is a golden-breaking event: either a real
regression or a deliberate spec change (re-record + explain in the
commit message).
"""

import hashlib
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import (  # noqa: E402
    GOLDEN_BATCH, GOLDEN_DOMAINS, GOLDEN_PAGES, GOLDEN_SEEDS, GOLDEN_WAVES,
)
from tweetf0rm_spark.crawl import Crawl, CrawlConfig  # noqa: E402
from tweetf0rm_spark.datagen import gen_corpus  # noqa: E402
from tweetf0rm_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


def run_crawl(spark):
    c = gen_corpus(GOLDEN_PAGES, GOLDEN_DOMAINS, GOLDEN_SEEDS)
    cr = Crawl(
        spark,
        tempfile.mkdtemp(prefix="golden_store_"),
        spark.createDataFrame(c.pages),
        spark.createDataFrame(c.robots_rules),
        spark.createDataFrame(c.politeness_budget),
        CrawlConfig(batch_size=GOLDEN_BATCH),
    )
    cr.init(spark.createDataFrame(c.seeds))
    cr.run(max_waves=GOLDEN_WAVES)
    return cr


def collect_traces(spark, cr):
    waves = []
    for snap in range(1, GOLDEN_WAVES + 1):
        waves.append({"wave": snap - 1, "urls": cr.fetch_trace(snap)})
    seen = sorted(r.url for r in cr.seen_urls().collect())
    md5s = {}
    for snap in range(1, GOLDEN_WAVES + 1):
        for r in cr.store.read(spark, "pages_delta", snap).collect():
            if r.text is not None:
                md5s[r.url] = hashlib.md5(r.text.encode()).hexdigest()
    lineage = [
        {"wave": r.wave, "domain": r.registered_domain,
         "candidates": r.candidates, "deduped": r.deduped,
         "blocked": r.blocked, "deferred": r.deferred, "fetched": r.fetched}
        for snap in range(1, GOLDEN_WAVES + 1)
        for r in cr.lineage(snap).collect()
    ]
    lineage.sort(key=lambda d: (d["wave"], d["domain"]))
    return waves, seen, md5s, lineage


def main():
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("record_golden", master="local[8]")
    cr = run_crawl(spark)
    waves, seen, md5s, lineage = collect_traces(spark, cr)
    with open(os.path.join(OUT, "trace_waves.jsonl"), "w") as f:
        for w in waves:
            f.write(json.dumps(w) + "\n")
    with open(os.path.join(OUT, "seen_final.txt"), "w") as f:
        f.write("\n".join(seen) + "\n")
    with open(os.path.join(OUT, "text_md5.tsv"), "w") as f:
        for url in sorted(md5s):
            f.write(f"{url}\t{md5s[url]}\n")
    with open(os.path.join(OUT, "lineage.jsonl"), "w") as f:
        for row in lineage:
            f.write(json.dumps(row, sort_keys=True) + "\n")
    print(f"recorded: {sum(len(w['urls']) for w in waves)} fetches over "
          f"{GOLDEN_WAVES} waves, {len(seen)} seen urls, {len(md5s)} texts")
    spark.stop()


if __name__ == "__main__":
    main()
