#!/usr/bin/env python
"""AQE skew-join evidence (VERDICT r1 item 8).

Joins the Zipf-skewed synthetic frontier (hot-domain imbalance from
``gen_frontier_df`` — the same skew the politeness salt fights) against
a per-domain dim table ON the skewed key ``registered_domain``, with
broadcast disabled so the join is sort-merge — the shape AQE's
skew-join splitting applies to. Skew thresholds are lowered so the
bench-scale hot partition (top Zipf domain ≈ a double-digit % of all
rows) trips the splitter exactly like a 100×-bigger partition would at
defaults on a cluster.

Prints one JSON line: timing with skew-join ON vs OFF and whether the
final adaptive plan contains ``skew=true`` splits; appends the
evidence row to PLANS.md.

Usage: python tools/skew_demo.py [n_rows]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tweetf0rm_spark.datagen import gen_frontier_df  # noqa: E402
from tweetf0rm_spark.session import get_spark  # noqa: E402


N_DOMAINS = 200  # fewer domains → hotter head (top domain ≈ 13% of rows)


def build_join(spark, n_rows: int):
    frontier = gen_frontier_df(spark, n_rows, n_domains=N_DOMAINS)
    # INDEPENDENT per-domain dim (politeness budgets): deriving the dim
    # from the frontier itself makes Spark reuse the frontier's
    # exchange for both join sides, and OptimizeSkewedJoin will not
    # split a reused exchange — with an independent build side the
    # split fires (verified: SortMergeJoin(skew=true) in the final
    # adaptive plan)
    dim = spark.range(0, N_DOMAINS + 1).select(
        F.concat(
            F.lit("site"), F.lpad(F.col("id").cast("string"), 5, "0"),
            F.lit(".example"),
        ).alias("registered_domain"),
        (F.pmod(F.xxhash64("id"), F.lit(64)) + 1).cast("int").alias(
            "max_per_wave"
        ),
    )
    joined = frontier.join(dim, "registered_domain").select(
        "registered_domain", "url_hash", "priority",
        F.col("max_per_wave").alias("n_dom"),
    )
    return joined


def run_once(spark, n_rows: int) -> tuple[float, str]:
    df = build_join(spark, n_rows)
    df.write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    # final-AQE plan must come from an EXECUTED QueryExecution — the
    # write path runs its own QE, so drive this Dataset's own QE with a
    # cheap Arrow collect (1 tiny column; the join survives pruning
    # because n_dom comes from the dim side)
    probe = df.select((F.col("n_dom") % 2).alias("x"))
    probe.toPandas()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    return wall, plan


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark(
        "skew-demo",
        extra_conf={
            # force SMJ (no broadcast) so the skewed shuffle exists —
            # BOTH the static and AQE runtime broadcast thresholds, or
            # AQE re-plans the join as broadcast and never needs a split
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            # scale AQE's skew trigger down to bench-sized partitions
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.shuffle.partitions": "64",
        },
    )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    sec_on, plan_on = run_once(spark, n_rows)
    n_splits = len(re.findall(r"skew=true", plan_on))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    sec_off, plan_off = run_once(spark, n_rows)

    result = {
        "job": "frontier ⋈ per-domain dim on Zipf registered_domain (SMJ)",
        "rows": n_rows,
        "skew_join_on_sec": round(sec_on, 3),
        "skew_join_off_sec": round(sec_off, 3),
        "skew_splits_in_plan": n_splits,
        "plan_has_skew_true": n_splits > 0,
        "speedup_x": round(sec_off / sec_on, 2) if sec_on else None,
    }
    print(json.dumps(result, ensure_ascii=False))

    if n_splits > 0:
        smj = [ln.strip() for ln in plan_on.splitlines() if "skew=true" in ln][:2]
        with open(os.path.join(REPO, "PLANS.md"), "a") as f:
            f.write(
                "\n### AQE skew-join evidence (tools/skew_demo.py)\n\n"
                f"- job: {result['job']}, {n_rows:,} rows\n"
                f"- `skew=true` occurrences in final adaptive plan: {n_splits}\n"
                f"- wall: {result['skew_join_on_sec']}s (skew-join on) vs "
                f"{result['skew_join_off_sec']}s (off) → "
                f"{result['speedup_x']}× \n"
                f"- plan lines:\n"
                + "".join(f"  - `{ln[:160]}`\n" for ln in smj)
            )
    spark.stop()


if __name__ == "__main__":
    main()
