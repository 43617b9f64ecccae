#!/usr/bin/env python
"""spark-submit entry point (north-rule deployment shape).

The north rule specifies "run via spark-submit --py-files on a
multi-executor cluster". This is that job file: it assumes the
``tweetf0rm_spark`` package arrives via ``--py-files`` (a zip built by
``tools/build_pyfiles.sh``) rather than an installed package, creates
its own SparkSession (master comes from spark-submit), runs one
scheduling wave on a synthetic frontier, and prints a JSON summary.

    tools/build_pyfiles.sh
    spark-submit --master local[8] \
        --py-files /tmp/tweetf0rm_spark.zip \
        tools/submit_demo.py 1000000
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.appName("tweetf0rm-spark-submit-demo")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    # imports resolve from the --py-files zip on driver AND executors
    from tweetf0rm_spark.datagen import gen_frontier_df
    from tweetf0rm_spark.operators.dedupe import anti_join_seen
    from tweetf0rm_spark.operators.politeness import apply_politeness

    frontier = gen_frontier_df(spark, n_rows)
    seen = gen_frontier_df(spark, n_rows // 5).select("url", "url_hash")
    t0 = time.time()
    batch = (
        apply_politeness(anti_join_seen(frontier, seen), None, default_budget=64)
        .filter(F.col("within_budget"))
    )
    n = batch.count()
    print(json.dumps({
        "scheduled": n,
        "sec": round(time.time() - t0, 3),
        "master": spark.sparkContext.master,
        "defaultParallelism": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
