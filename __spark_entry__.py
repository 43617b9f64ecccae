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


# The driver's correctness gate records only the FIRST 50 registry
# entries in iteration order.  After the r4 rotation every one of the
# 107 registry queries has a driver-green record (CORRECTNESS_r01..r04
# key-set union = full registry, r4 = 50/50 green).  Round-5 rotation:
# refresh the STALEST evidence — 35 of the 36 queries last recorded
# in r2 (case_when, twice green and trivial, yields its slot) and the
# 10 text-family queries last recorded in r3 — plus the r5 addition
# text_search_ranked (needs its first record), crawl_fetch_schedule
# (its fetch_at_s semantics changed to the running-sum formula this
# round, ADVICE r4) and one flagship per remaining family for
# continuity (crawl wave / stream wave / media decode).  The queries
# left outside the window keep their r2/r3 driver records and their
# golden/pytest pins.  tests/test_entry.py pins the composition.
_PRIORITY = [
    # -- last driver-recorded in r2 (35: the stalest evidence) ---------
    "scan_project_filter",
    "filter_in_like_null",
    "join_inner_agg",
    "join_left_nulls",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "join_range_bucket",
    "join_asof",
    "agg_count_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_collect_sorted",
    "agg_pivot",
    "agg_percentile",
    "window_lag_gap",
    "window_running_sum",
    "window_ntile",
    "window_percent_first_last",
    "topk_global",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "string_funcs2",
    "datetime_funcs",
    "math_funcs",
    "json_funcs",
    "json_struct_funcs",
    "hash_funcs",
    "array_funcs",
    "array_explode_wordcount",
    "array_posexplode_zip",
    "map_funcs",
    "binary_funcs",
    # -- last driver-recorded in r3, text family (10) -------------------
    "text_langid_heuristic",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_chunk_windows",
    "sample_stratified_topn",
    "split_assign_counts",
    "text_tfidf_topk",
    "dedup_repeated_segments",
    "dedup_decontaminate",
    "text_vocab_coverage",
    # -- new in r5 (A10 ranked search) + changed this round --------------
    "text_search_ranked",
    "crawl_fetch_schedule",
    # -- family flagships for per-round continuity -----------------------
    "crawl_wave_schedule",
    "stream_wave_schedule",
    "media_decode_features",
]


def _registry():
    from tweetf0rm_spark.queries import REL
    from tweetf0rm_spark.queries_crawl import CRAWL
    from tweetf0rm_spark.queries_media import MEDIA
    from tweetf0rm_spark.queries_text import TEXT

    flat = {}
    for reg in (REL, CRAWL, TEXT, MEDIA):
        flat.update(reg)
    missing = [n for n in _PRIORITY if n not in flat]
    if missing:  # fail loudly: a renamed query must update _PRIORITY
        raise KeyError(f"_PRIORITY names not in registry: {missing}")
    merged = {n: flat[n] for n in _PRIORITY}
    merged.update({n: q for n, q in flat.items() if n not in merged})
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in _registry().items() if q.oracle is not None
    }
