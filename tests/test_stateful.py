"""lifetime_budget_stream (streaming/stateful.py): keyed state must
survive across micro-batches — the cumulative per-domain cap is the
whole point, so the tests force multi-batch streams and check the
admitted totals, ordering, and replay-prefix determinism."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tweetf0rm_spark.streaming.stateful import lifetime_budget_stream

DDL = "url string, url_hash long, registered_domain string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, fdir, out, ckpt, budget, max_files=1):
    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(fdir)
    )
    q = (
        lifetime_budget_stream(stream, lifetime_budget=budget)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_budget_spans_micro_batches(spark, tmp_path):
    fdir, out, ckpt = (str(tmp_path / d) for d in ("f", "o", "c"))
    # two batches × 4 urls for domain a; budget 5 ⇒ 4 from batch 1,
    # exactly 1 from batch 2 — only cross-batch state can do that
    _write_batch(
        spark, fdir, [(f"http://a.example/{i}", i, "a.example") for i in range(4)]
    )
    _write_batch(
        spark, fdir,
        [(f"http://a.example/{i}", i, "a.example") for i in range(10, 14)],
    )
    got = _drain(spark, fdir, out, ckpt, budget=5)
    rows = got.filter(F.col("registered_domain") == "a.example").collect()
    assert len(rows) == 5
    assert sorted(r.lifetime_rank for r in rows) == [1, 2, 3, 4, 5]
    # the second batch's single admit saw the carried counter
    assert {r.n_before for r in rows} == {0, 4}


def test_domains_isolated_and_order_deterministic(spark, tmp_path):
    fdir, out, ckpt = (str(tmp_path / d) for d in ("f", "o", "c"))
    rows = [(f"http://{d}/{i}", h, d)
            for d in ("x.example", "y.example")
            for i, h in enumerate([30, 10, 20])]
    _write_batch(spark, fdir, rows)
    got = _drain(spark, fdir, out, ckpt, budget=2)
    by_dom = {
        d: sorted(
            ((r.lifetime_rank, r.url_hash) for r in got.collect()
             if r.registered_domain == d)
        )
        for d in ("x.example", "y.example")
    }
    # budget applies per domain; admits follow url_hash order (10, 20)
    for d in by_dom:
        assert by_dom[d] == [(1, 10), (2, 20)]


def test_exhausted_domain_emits_nothing(spark, tmp_path):
    fdir, out, ckpt = (str(tmp_path / d) for d in ("f", "o", "c"))
    _write_batch(
        spark, fdir, [(f"http://z.example/{i}", i, "z.example") for i in range(3)]
    )
    _write_batch(
        spark, fdir,
        [(f"http://z.example/{i}", i, "z.example") for i in range(20, 23)],
    )
    got = _drain(spark, fdir, out, ckpt, budget=3)
    assert got.count() == 3
    assert got.agg(F.max("lifetime_rank")).first()[0] == 3
