"""SparkSession factory with the engine's scale-oriented defaults.

Replaces the reference's ``bootstrap.py`` node bring-up
(``[U] bootstrap.py``: parse config → spawn one process per API key) —
here Spark owns worker scheduling; the knobs below are the ones that
matter for the 100 TB / 1000-executor target and are safe at local[32].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # AQE: runtime re-plan, partition coalescing, skew-join splitting —
    # the hot-domain skew story (BASELINE.json:L14) leans on these plus
    # our explicit salting (operators/politeness.py).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # UTC everywhere — DuckDB-oracle timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for every Python boundary (input_hint: no per-row Python).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # html-bearing batches are wide; cap rows per Arrow batch so a batch
    # of binary bodies stays ~tens of MB (SURVEY.md §4).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    # local mode: shuffle partitions ≈ cores, not 200.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
}


def get_spark(app: str = "tweetf0rm_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app).master(
        master or f"local[{cores}]"
    )
    for k, v in {**DEFAULT_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
