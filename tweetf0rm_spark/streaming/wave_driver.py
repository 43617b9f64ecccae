"""Structured-Streaming wave driver (SURVEY.md §2.B streaming surface).

The north rule is batch-wave shaped, so streaming is a thin veneer:
continuous crawling = the same wave job applied to micro-batches of
newly-discovered frontier rows. Reference analogue: the crawler
processes block on redis BRPOP forever (``[U]
tweetf0rm/process/twitter_crawler.py``) — here the "forever loop" is
``readStream`` on the frontier directory with
``trigger(availableNow=True)`` per crawl session, and state
(seen-set, politeness) lives in snapshot tables, NOT in the stream
state store (SURVEY.md §2.B: state stores can't be snapshot-diffed;
our tables can).

Design notes for scale:
- ``foreachBatch`` reuses the exact batch operators (canonicalize →
  dedupe → politeness), so the streaming path cannot drift from the
  batch path — one implementation, two drivers.
- ``maxFilesPerTrigger`` bounds micro-batch size; at cluster scale the
  frontier dir is an object-store prefix and each trigger is one wave.
- telemetry aggregations are watermarked so state is bounded: late
  outlinks older than the watermark fold into the next session's wave
  rather than reordering a committed one (SURVEY.md §2.B).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedupe import anti_join_seen, dedupe_within
from ..operators.politeness import DEFAULT_BUDGET, N_SALTS, apply_politeness
from ..wave import FRONTIER_COLS, canonicalized

#: frontier parquet schema for the stream reader (streams need an
#: explicit schema — no inference on readStream).
FRONTIER_DDL = (
    "url string, url_hash long, host string, registered_domain string, "
    "depth int, priority double, state string, wave int"
)


def frontier_stream(
    spark: SparkSession, frontier_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over a frontier directory of parquet files."""
    reader = spark.readStream.schema(FRONTIER_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(frontier_dir)


def run_streaming_schedule(
    spark: SparkSession,
    frontier_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    seen: DataFrame | None = None,
    politeness_budget: DataFrame | None = None,
    n_salts: int = N_SALTS,
    default_budget: int = DEFAULT_BUDGET,
    on_batch: Callable[[DataFrame, int], None] | None = None,
    max_files_per_trigger: int | None = None,
):
    """Continuously schedule frontier micro-batches into fetch batches.

    Each micro-batch runs the batch scheduling operators and writes
    the in-budget rows (with per-domain rank) to ``out_dir`` under an
    ``epoch=<id>`` partition. Returns the finished ``StreamingQuery``
    (``availableNow`` drains all input then stops — the "one crawl
    session" trigger).

    Exactly-once + cross-batch dedupe semantics:

    - **Idempotent sink**: each epoch dynamic-partition-overwrites ONLY
      its own ``epoch=<id>`` directory, so a micro-batch retried after
      a failure between the parquet write and the checkpoint commit
      replaces its partial output instead of appending duplicates.
    - **Cross-batch dedupe**: candidates are anti-joined against the
      urls already emitted by earlier epochs of this session (in
      addition to the caller's ``seen``), so splitting the input with
      ``maxFilesPerTrigger`` never re-emits a url.
    - **Budget caveat** (documented, matches the batch driver's wave
      semantics): the per-domain politeness budget applies per
      micro-batch = per wave; n micro-batches may emit up to n×budget
      *distinct* urls per domain, exactly as n batch waves would.
    """
    stream = frontier_stream(spark, frontier_dir, max_files_per_trigger)
    out_ddl = FRONTIER_DDL + ", host_rank int, epoch long"

    def _schedule(batch_df: DataFrame, epoch_id: int) -> None:
        cand = canonicalized(batch_df.filter(F.col("state") == "QUEUED"))
        cand = dedupe_within(cand.select(*FRONTIER_COLS))
        if seen is not None:
            cand = anti_join_seen(cand, seen)
        try:  # urls emitted by earlier epochs of this session. MUST
            # exclude the current epoch: a retried epoch would otherwise
            # anti-join against its own partial failed output and then
            # overwrite the partition with only the remainder.
            prev = (
                spark.read.schema(out_ddl)
                .parquet(out_dir)
                .filter(F.col("epoch") != epoch_id)
            )
            cand = anti_join_seen(cand, prev.select("url_hash"))
        except Exception:
            pass  # first epoch — nothing emitted yet
        polite = apply_politeness(
            cand, politeness_budget, n_salts=n_salts, default_budget=default_budget
        )
        batch = polite.filter(F.col("within_budget")).select(
            *FRONTIER_COLS, "host_rank"
        ).withColumn("epoch", F.lit(epoch_id))
        (
            batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_dir)
        )
        if on_batch is not None:
            on_batch(batch, epoch_id)

    q = (
        stream.writeStream.foreachBatch(_schedule)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def host_rate_telemetry(
    fetched: DataFrame,
    window_dur: str = "15 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-host fetch-rate windows (mirrors the reference's 15-minute
    Twitter rate-limit windows, §2.A A5). Works on a stream (bounded
    state via watermark) or a batch DataFrame (identical semantics —
    pytest checks batch/stream agreement)."""
    win = (
        F.window("warc_ts", window_dur, slide)
        if slide
        else F.window("warc_ts", window_dur)
    )
    src = fetched.withWatermark("warc_ts", watermark) if fetched.isStreaming else fetched
    return (
        src.groupBy(win.alias("w"), "registered_domain")
        .agg(F.count("*").alias("n_fetched"))
        .select(
            F.col("w.start").alias("window_start"),
            "registered_domain",
            "n_fetched",
        )
    )


def session_telemetry(
    fetched: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per host — crawl burst detection."""
    src = fetched.withWatermark("warc_ts", watermark) if fetched.isStreaming else fetched
    return (
        src.groupBy(
            F.session_window("warc_ts", gap).alias("w"), "registered_domain"
        )
        .agg(F.count("*").alias("n_fetched"))
        .select(
            F.col("w.start").alias("session_start"),
            "registered_domain",
            "n_fetched",
        )
    )
