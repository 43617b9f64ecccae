"""Recall of the approximate similarity paths vs the brute-force
baseline (VERDICT r2 item 7): the scale queries trade recall for a
bounded candidate set — this quantifies the trade on the fixture and
pins floors so a regression in the banding/probing shows up as red.

Truth is computed in-process with numpy (exact cosine over all pairs,
same 6-dp rounding and (cos desc, id asc) tie-break as the engine);
the approximate results come from the actual registry queries.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tweetf0rm_spark.queries_text import TEXT

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb():
    tb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    V = np.array([np.array(x, dtype=np.float64) for x in tb["embedding"]])
    ids = tb["vec_id"].to_numpy()
    nrm = np.linalg.norm(V, axis=1)
    C = np.round((V @ V.T) / np.outer(nrm, nrm), 6)
    return ids, C


def _true_topk(ids, C, qset, k):
    out = {}
    for qi, q in enumerate(ids):
        if q not in qset:
            continue
        order = sorted(
            range(len(ids)), key=lambda j: (-C[qi, j], ids[j])
        )
        out[q] = [ids[j] for j in order if ids[j] != q][:k]
    return out


def _topk_recall(spark, name, qset, k, ids, C):
    df = TEXT[name].spark(spark, SF).toPandas()
    truth = _true_topk(ids, C, qset, k)
    per_q = []
    for q, want in truth.items():
        got = set(df[df.q_vec == q].neighbor)
        per_q.append(len(got & set(want)) / k)
    return sum(per_q) / len(per_q)


def test_ann_lsh_recall_floor(spark, emb):
    ids, C = emb
    r = _topk_recall(spark, "ann_lsh_bucketed", set(range(20)), 5, ids, C)
    # measured 0.70 with R=4, B=8 banding (was 0.04 single-bucket)
    assert r >= 0.60, f"banded sign-LSH recall@5 regressed: {r:.3f}"


def test_ann_ivf_recall_floor(spark, emb):
    ids, C = emb
    r = _topk_recall(spark, "ann_ivf_topk", set(range(5)), 5, ids, C)
    # measured 0.96 with 8 cells / nprobe=2
    assert r >= 0.85, f"IVF recall@5 regressed: {r:.3f}"


def test_neardup_pair_recall_floor(spark, emb):
    ids, C = emb
    iu = np.triu_indices(len(ids), 1)
    truth = {
        (min(ids[a], ids[b]), max(ids[a], ids[b]))
        for a, b in zip(*iu)
        if C[a, b] >= 0.35
    }
    got = TEXT["dedup_embedding_neardup"].spark(spark, SF).toPandas()
    got_pairs = {(int(r.vec_a), int(r.vec_b)) for r in got.itertuples()}
    # precision is 1.0 by construction (exact cosine verification)
    assert got_pairs <= truth
    rec = len(got_pairs & truth) / max(1, len(truth))
    # measured 0.73 with R=4, B=8 (was 0.05 single-bucket)
    assert rec >= 0.65, f"near-dup pair recall regressed: {rec:.3f}"


def test_brute_force_is_exact(spark, emb):
    """The baseline really is recall 1.0 — byte-exact top-10."""
    ids, C = emb
    r = _topk_recall(
        spark, "ann_brute_force_topk", set(range(5)), 10, ids, C
    )
    assert r == 1.0
