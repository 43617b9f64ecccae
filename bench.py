#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "frontier": {...}}

Two parts:

1. **Headline oracle queries** — representative rows of SURVEY.md §2.B
   (crawl wave, TPC-H-ish agg/join/window, dedupe, ANN) timed with a
   ``noop``-sink write so the whole plan executes without collecting
   rows to the driver.
2. **North-metric frontier run** — ``gen_frontier_df`` (JVM-side
   builtins, Zipf hot-domain skew) → full scheduling pipeline (exact
   anti-join dedupe vs a synthetic seen-set → robots verdict → salted
   politeness top-k) → URLs scheduled+deduped/sec. This is the number
   BASELINE.json:L2 tracks; tools/scaling_run.py repeats it at
   local[8] vs local[32] for the N→4N efficiency criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from tweetf0rm_spark.datagen import gen_frontier_df  # noqa: E402
from tweetf0rm_spark.operators.dedupe import anti_join_seen  # noqa: E402
from tweetf0rm_spark.operators.politeness import apply_politeness  # noqa: E402
from tweetf0rm_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "crawl_wave_schedule",
    "crawl_seen_anti_join",
    "crawl_politeness_topk",
    "tpch_q1_pricing",
    "join_inner_agg",
    "window_topk_per_group",
    "stream_sessionization",
    "dedup_minhash_lsh",
    "dedup_exact_groups",
    "dedup_connected_components",
    "ann_brute_force_topk",
    "ann_lsh_bucketed",
    "text_quality_score",
    "text_chunk_windows",
    "pipeline_training_data",
]

FRONTIER_ROWS = int(os.environ.get("SPARK_GRAFT_FRONTIER_ROWS", 5_000_000))


def _run_to_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def frontier_bench(spark, n_rows: int) -> dict:
    """One scheduling wave over a synthetic skewed frontier; returns
    wall time + URLs/sec for the dedupe+schedule pipeline."""
    frontier = gen_frontier_df(spark, n_rows)
    # synthetic seen-set: ~20% of the key space, built from the same
    # deterministic generator so the anti-join does real work
    seen = (
        gen_frontier_df(spark, n_rows // 5)
        .select("url", "url_hash")
    )
    novel = anti_join_seen(frontier, seen)
    polite = apply_politeness(novel, None, default_budget=64)
    batch = polite.filter(F.col("within_budget")).select(
        "url", "url_hash", "registered_domain", "depth", "priority", "host_rank"
    )
    # warm-up (JIT/codegen) then best-of-3 — wall time on a shared box
    # is noisy (CPU-steal storms recorded in BENCH.md round-3/4), and
    # min-of-repeats is the standard estimator for it
    _run_to_noop(batch)
    walls = []
    for _ in range(3):
        t0 = time.time()
        _run_to_noop(batch)
        walls.append(time.time() - t0)
    wall = min(walls)
    return {
        "rows": n_rows,
        "sec": round(wall, 3),
        "urls_per_sec": round(n_rows / wall, 1),
    }


def extract_bench(spark, n_pages: int) -> dict:
    """Arrow fetch+extract throughput: JVM-generated HTML bodies →
    mapInPandas extract (the engine's only hot-path Python crossing)."""
    from tweetf0rm_spark.extract import extract_text
    import pandas as pd

    body = F.concat(
        F.lit("<html><head><title>T"), F.col("id").cast("string"),
        F.lit("</title><script>var x=1;</script></head><body>"),
        F.repeat(
            F.concat(F.lit("<p>lorem ipsum dolor sit amet consectetur "
                           "adipiscing elit sed do eiusmod tempor row "),
                     F.col("id").cast("string"), F.lit("</p>")),
            8,
        ),
        F.lit('<a href="https://www.example.org/a">x</a></body></html>'),
    )
    pages = spark.range(n_pages).select(
        F.col("id"), F.encode(body, "utf-8").alias("html")
    )

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf["id"],
                "n_chars": pdf["html"].map(
                    lambda b: len(extract_text(bytes(b)))),
            })

    out = pages.mapInPandas(kernel, "id long, n_chars int")
    _run_to_noop(out)  # warm-up
    walls = []
    for _ in range(2):
        t0 = time.time()
        _run_to_noop(out)
        walls.append(time.time() - t0)
    wall = min(walls)
    return {
        "pages": n_pages,
        "sec": round(wall, 3),
        "pages_per_sec": round(n_pages / wall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")

    from __spark_entry__ import queries

    reg = queries()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        df = reg[name](spark, sf_dir)
        _run_to_noop(df)  # warm-up: parquet footer cache, codegen compile
        # min-of-2 timed reps, same estimator as the frontier probe —
        # single-rep headline times flapped round-over-round on this
        # shared host (BENCH.md round-3/round-4 attribution sections)
        walls = []
        for _ in range(2):
            t0 = time.time()
            _run_to_noop(df)
            walls.append(time.time() - t0)
        per_query[name] = round(min(walls), 3)

    fr = frontier_bench(spark, FRONTIER_ROWS)
    ex = extract_bench(spark, int(os.environ.get("SPARK_GRAFT_EXTRACT_PAGES",
                                                 200_000)))

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf_val,
        "frontier": fr,
        "extract": ex,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
