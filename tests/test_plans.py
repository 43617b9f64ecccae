"""Physical-plan lints over the registry (PLANS.md, automated):
scale-killers must not creep in. Complements the per-round manual
explain audits — these run on every pytest.

Checks (sf0.001, plans only — nothing is executed except the stream
family, which is excluded because building its result DF runs the
stream):

1. No CartesianProduct / BroadcastNestedLoopJoin anywhere, EXCEPT the
   allowlisted broadcast-tiny cross joins (1-row corpus totals, 8-row
   centroid tables) — each allowlisted plan may contain at most the
   number the query's own crossJoin(broadcast(...)) calls produce.
2. REL-family queries are pure JVM: no Arrow/pandas eval nodes (the
   UDF surface lives in the crawl/text/media families by design).
3. Filter pushdown reaches the parquet scan in the representative
   scan query (PushedFilters non-empty).
"""

import os

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

#: broadcast-tiny cross joins, audited by hand (VERDICT r3 "Nothing
#: else survived the hunt"): centroid table (8 rows) / 1-row totals.
#: Anything else showing a BNLJ/cartesian is a scale bug.
BNLJ_ALLOWED = {
    "ann_ivf_topk": 2,           # centroid assign (cells + query probe)
    "text_tfidf_topk": 1,        # 1-row n_docs
    "text_search_ranked": 1,     # 1-row n_docs (idf), same as tfidf
    "text_vocab_coverage": 1,    # 1-row corpus total
    "pipeline_training_data": 2, # composed corpus-stat totals
    "ann_brute_force_topk": 1,   # broadcast 5-row query side ⋈≠ (the
                                 # brute-force baseline BY DESIGN; the
                                 # scale path is ann_lsh/ann_ivf)
    "join_range_bucket": 1,      # broadcast 3-row bucket dim theta join
}

PY_NODES = (
    "ArrowEvalPython", "BatchEvalPython", "MapInPandas",
    "FlatMapGroupsInPandas", "MapInArrow", "PythonUDTF",
)


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_no_unexpected_cartesian_or_bnlj(spark):
    bad = []
    for name, fn in entry_mod.queries().items():
        if name.startswith("stream"):
            continue
        plan = _phys(fn(spark, SF))
        n = plan.count("BroadcastNestedLoopJoin") + plan.count(
            "CartesianProduct"
        )
        if n > BNLJ_ALLOWED.get(name, 0):
            bad.append(f"{name}: {n} BNLJ/cartesian nodes")
    assert not bad, bad


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_rel_family_is_pure_jvm(spark):
    from tweetf0rm_spark.queries import REL

    bad = []
    for name in REL:
        plan = _phys(entry_mod.queries()[name](spark, SF))
        hits = [nd for nd in PY_NODES if nd in plan]
        if hits:
            bad.append(f"{name}: {hits}")
    assert not bad, bad


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_filter_pushdown_reaches_scan(spark):
    plan = _phys(entry_mod.queries()["scan_project_filter"](spark, SF))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "no filters pushed to the parquet scan"
