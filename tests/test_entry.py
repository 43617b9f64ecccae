"""Driver-contract smoke: entry() runs, registry is well-formed, and a
spot-check of oracle agreement (the exhaustive sweep lives in
tools/check_oracle.py and the driver's own gate)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_registry_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 108
    assert set(oracles) <= set(qs)
    # since r4 EVERY registry query has a full value oracle (the media
    # decode stub's fake path became oracle-expressible) — keep it so
    assert set(qs) == set(oracles)


def test_registry_first50_covers_every_family():
    """The driver's correctness gate records only the first 50 entries
    of ``queries()`` in iteration order; pin the r5 rotation: with all
    107 queries cumulatively driver-green after r4, the window now
    refreshes the STALEST records (the 36 last recorded in r2 + the 10
    text-family queries last recorded in r3), plus the query whose
    semantics changed this round (crawl_fetch_schedule → running-sum
    fetch_at_s) and one flagship per remaining family for per-round
    continuity."""
    first50 = list(entry_mod.queries())[:50]

    def fam(n):
        if n.startswith("crawl"):
            return "crawl"
        if n.startswith("stream"):
            return "stream"
        if n.startswith("media"):
            return "media"
        if n.startswith(("dedup", "ann", "text", "sample", "split")):
            return "text"
        return "rel"

    counts = {}
    for n in first50:
        counts[fam(n)] = counts.get(fam(n), 0) + 1
    assert counts["rel"] >= 30   # the r2-stale refresh block
    assert counts["text"] >= 10  # the r3-stale text refresh block
    assert counts["crawl"] >= 2
    assert counts["stream"] >= 1
    assert counts["media"] >= 1
    for required in (
        # new in r5 (A10 ranked search) — needs its first driver record
        "text_search_ranked",
        # changed this round — must be re-recorded under new semantics
        "crawl_fetch_schedule",
        # family flagships for continuity
        "crawl_wave_schedule", "stream_wave_schedule",
        "media_decode_features",
        # spot-pins of the stale-refresh blocks (r2 / r3 recorded last)
        "scan_project_filter", "join_asof", "agg_grouping_sets",
        "window_percent_first_last", "set_union_distinct",
        "binary_funcs", "text_langid_heuristic", "dedup_simhash",
        "text_vocab_coverage", "dedup_decontaminate",
    ):
        assert required in first50, required


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_registry_no_complex_output(spark):
    """Driver-harness contract (CORRECTNESS_r03 `crawl_extract_text`
    err): the driver's canonicalizer sorts pandas cells and cannot
    hash list/dict values — `TypeError: unhashable type: 'list'`. So
    NO registry query may output an Array/Map/Struct column; serialize
    (e.g. concat_ws(chr(31), arr)) instead. Schema-only for the batch
    families (building the DataFrame is cheap at sf0.001 and never
    collects); the stream_* entries are SKIPPED — their query functions
    run the stream to produce the result frame, so even `.schema` costs
    six streaming jobs (ADVICE r4; same exclusion as test_plans.py).
    Their flat output schemas are pinned by the driver's oracle gate,
    which hashes every stream query's values each round."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, fn in entry_mod.queries().items():
        if name.startswith("stream_"):
            continue
        schema = fn(spark, SF).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"complex-typed registry outputs: {bad}"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
@pytest.mark.parametrize(
    "name", ["tpch_q1_pricing", "crawl_wave_schedule", "dedup_minhash_lsh"]
)
def test_oracle_spot_check(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sdf = entry_mod.queries()[name](spark, SF)
    srows = sorted(map(tuple, ((str(c) for c in row) for row in sdf.collect())))
    ores = con.sql(entry_mod.oracle_sql()[name])
    # align column order by name, as the driver does
    scols = sdf.columns
    order = [scols.index(c) for c in sorted(scols)]
    srows = sorted(
        tuple(str(row[i]) for i in order) for row in sdf.collect()
    )
    ocols = list(ores.columns)
    oorder = [ocols.index(c) for c in sorted(ocols)]
    orows = sorted(
        tuple(str(row[i]) for i in oorder) for row in ores.fetchall()
    )
    assert len(srows) == len(orows)
