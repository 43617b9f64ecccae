"""Bucketed seen-set ⇒ shuffle-free dedupe join (evidence for the
BENCH.md 10^10 row "seen side pre-bucketed ⇒ only the candidate side
moves").

Writes the seen-set as a bucketed+sorted table (``bucketBy(B,
'url_hash')``), then runs the dedupe anti-join twice:

- seen = plain parquet  → BOTH sides exchange (full seen shuffle/wave);
- seen = bucketed table → NO Exchange above the seen scan; only the
  candidate side shuffles (to the seen side's bucket count).

Broadcast is disabled so the comparison is the large-seen regime the
10^10 design targets. Prints plan evidence (Exchange count per side)
and wall times. Run: ``python tools/bucket_demo.py [rows]``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from tweetf0rm_spark.session import get_spark  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
BUCKETS = 32

wh = tempfile.mkdtemp(prefix="bucket_wh_")
spark = get_spark(
    "bucket_demo",
    master="local[16]",
    extra_conf={
        "spark.sql.warehouse.dir": wh,
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",  # stable plan text
        "spark.sql.shuffle.partitions": str(BUCKETS),
        "spark.local.dir": "/dev/shm/spark-local",
    },
)
os.makedirs("/dev/shm/spark-local", exist_ok=True)

seen = spark.range(ROWS).select(F.xxhash64("id").alias("url_hash"))
# candidates: 20% collide with seen, 80% novel
cand = spark.range(ROWS).select(
    F.when(F.col("id") % 5 == 0, F.xxhash64("id"))
    .otherwise(F.xxhash64(F.col("id") + ROWS * 7))
    .alias("url_hash")
)

pq_dir = os.path.join(wh, "seen_plain")
seen.write.parquet(pq_dir)
(
    seen.write.bucketBy(BUCKETS, "url_hash")
    .sortBy("url_hash")
    .mode("overwrite")
    .saveAsTable("seen_bucketed")
)
cand_dir = os.path.join(wh, "cand")
cand.write.parquet(cand_dir)
cand_df = spark.read.parquet(cand_dir)


def run(seen_df, label):
    novel = cand_df.join(seen_df, "url_hash", "left_anti")
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        novel._jdf.queryExecution(), "simple"
    )
    n_exch = sum("Exchange hashpartitioning" in l for l in plan.splitlines())
    novel.count()  # warm
    t0 = time.time()
    n = novel.count()
    wall = time.time() - t0
    print(f"{label}: novel={n} exchanges={n_exch} wall={wall:.2f}s")
    return n, n_exch, wall


n1, e1, w1 = run(spark.read.parquet(pq_dir), "plain-parquet seen")
n2, e2, w2 = run(spark.table("seen_bucketed"), "bucketed seen   ")
assert n1 == n2, "results diverge"
assert e2 == e1 - 1, (
    f"bucketed plan should drop exactly the seen-side exchange ({e1}->{e2})"
)
print(
    f"PASS: bucketed table removed the seen-side shuffle "
    f"({e1} -> {e2} exchanges), {w1 / w2:.2f}x wall at {ROWS} rows"
)
spark.stop()
shutil.rmtree(wh, ignore_errors=True)
