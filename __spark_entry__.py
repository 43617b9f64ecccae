"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The registry lives in ``tweetf0rm_spark.queries*`` (one entry per
SURVEY.md §2.B operator row); this module only adapts it to the
driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one full scheduling wave (canonicalize → dedupe →
    robots → politeness → priority order) on the sf0.001 derived
    frontier. Driver checks rows > 0."""
    from tweetf0rm_spark.queries_crawl import CRAWL

    return CRAWL["crawl_wave_schedule"].spark(spark, "/root/testdata/sf0.001")


def _registry():
    from tweetf0rm_spark.queries import REL
    from tweetf0rm_spark.queries_crawl import CRAWL
    from tweetf0rm_spark.queries_media import MEDIA
    from tweetf0rm_spark.queries_text import TEXT

    merged = {}
    for reg in (REL, CRAWL, TEXT, MEDIA):
        merged.update(reg)
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in _registry().items() if q.oracle is not None
    }
