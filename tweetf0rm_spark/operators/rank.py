"""Distributed exact global row-number (SURVEY.md §2.B sort/top-k rows).

``Window.orderBy(...)`` with no ``partitionBy`` is a scale-killer: Spark
moves the ENTIRE input through one task to number it. The engine's wave
needs a global fetch order over the in-budget set — at 10^10-URL scale
that set is budget × #domains, far too large for one task.

Exact two-phase restatement (same trick as the salted politeness top-k,
operators/politeness.py):

  phase 1: ``repartitionByRange(P, order)`` — range shuffle so partition
           i holds a contiguous slice of the global order; within each
           partition compute a local ``row_number`` (window partitioned
           by ``spark_partition_id()``, so P bounded tasks, never one).
  phase 2: per-partition row counts (P rows, tiny) → running-sum offsets
           → broadcast-join the offset back; global rank = local rank +
           offset of all earlier partitions.

The result is byte-identical to the single-task window PROVIDED the
order is a strict total order (the engine's always ends in ``url_hash``,
unique per batch after ``dedupe_within``): ties crossing a range
boundary would otherwise be numbered by partition placement.

CORRECTNESS REQUIREMENT — the range-shuffled frame is consumed twice
(once for local ranks, once for per-partition counts).
``repartitionByRange`` picks its split points by reservoir *sampling*,
so two independent executions of the same exchange can draw DIFFERENT
boundaries; offsets computed against one partitioning applied to ranks
from another silently corrupt the global numbering (observed: ~87% of
ranks wrong on a 5k-row frame — Spark does not reliably reuse the
exchange across the two subtrees, with or without AQE). The fix is the
same one every zipWithIndex-style DataFrame utility uses: persist the
shuffled frame, so both consumers scan ONE cached RDD whose
RangePartitioner was instantiated exactly once. Even on cache eviction
a recomputed block replays the same already-built partitioner, so
boundaries stay fixed. The cached frame is the batch being ranked
(bounded: the in-budget set, not the frontier); callers that loop
(``Crawl.step``) clear it per wave, and it is exposed on the result as
``._gr_cached`` so ``run_wave(persist=True)`` can unpersist it with the
wave's other frames.

Cost: one range shuffle + one cached scan + one hash shuffle on the
P-valued partition id (bounded tasks) + a P-row broadcast offset join.
No single-task stage anywhere; survives a 100× scale-up by raising
``num_partitions``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def global_row_number(
    df: DataFrame,
    order: list[Column],
    name: str = "rn",
    num_partitions: int | None = None,
    out_type: str = "int",
) -> DataFrame:
    """Add exact global ``row_number() over (order by *order)`` as
    ``name`` without a single-partition window. ``order`` must be a
    strict total order (end it with a unique key). The returned frame
    carries the internally-persisted shuffle as ``._gr_cached`` —
    unpersist it (or ``spark.catalog.clearCache()``) when done."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    parted = df.repartitionByRange(num_partitions, *order).withColumn(
        "_gr_pid", F.spark_partition_id()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    w_local = Window.partitionBy("_gr_pid").orderBy(*order)
    local = parted.withColumn("_gr_lr", F.row_number().over(w_local))

    # P rows — the only "global" window runs over this tiny frame
    counts = local.groupBy("_gr_pid").agg(F.count("*").alias("_gr_n"))
    w_off = (
        Window.orderBy("_gr_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_gr_pid",
        F.coalesce(F.sum("_gr_n").over(w_off), F.lit(0)).alias("_gr_off"),
    )

    out = local.join(F.broadcast(offsets), on="_gr_pid", how="inner")
    out = out.withColumn(
        name, (F.col("_gr_lr") + F.col("_gr_off")).cast(out_type)
    ).drop("_gr_pid", "_gr_lr", "_gr_off")
    out._gr_cached = parted  # for caller-scoped unpersist
    return out
