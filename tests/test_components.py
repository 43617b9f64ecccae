"""connected_components (operators/components.py): hash-min label
propagation over a pair table — the dedup-cluster assembly operator."""

from pyspark.sql import functions as F

from tweetf0rm_spark.operators.components import (
    connected_components, connected_components_star,
)


def _run(spark, n_vertices, edge_pairs):
    verts = spark.createDataFrame([(i,) for i in range(n_vertices)], ["id"])
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs], ["src", "dst"]
    )
    out = connected_components(verts, edges)
    return {r["id"]: r["component"] for r in out.collect()}


def test_chain_needs_multiple_rounds(spark):
    # 0-1-2-3-4-5 chain: diameter 5, min label must propagate end-to-end
    comp = _run(spark, 8, [(i, i + 1) for i in range(5)] + [(6, 7)])
    assert all(comp[i] == 0 for i in range(6))
    assert comp[6] == comp[7] == 6


def test_star_equivalent_on_random_graphs(spark):
    """large-star/small-star ≡ hash-min on random graphs (deterministic
    edge generation — no RNG state)."""
    import hashlib

    for seed in (1, 2, 3):
        n = 60
        pairs = []
        for i in range(n):
            for j in range(i + 1, n):
                h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
                if int(h[:4], 16) % 37 == 0:  # ~2.7% edge density
                    pairs.append((i, j))
        verts = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        edges = spark.createDataFrame(pairs or [(0, 0)], ["src", "dst"])
        a = {
            r["id"]: r["component"]
            for r in connected_components(verts, edges).collect()
        }
        b = {
            r["id"]: r["component"]
            for r in connected_components_star(verts, edges).collect()
        }
        assert a == b, (seed, a, b)


def test_star_handles_pathological_chain_in_log_rounds(spark):
    """A 200-node chain: hash-min needs 200 rounds (raises at 25);
    the star alternation converges within its default 40 — in practice
    O(log n) ≈ 8 — and labels the whole chain component 0."""
    import pytest

    n = 200
    verts = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, edges, max_iter=25)
    comp = {
        r["id"]: r["component"]
        for r in connected_components_star(verts, edges).collect()
    }
    assert all(comp[i] == 0 for i in range(n))


def test_star_isolated_vertices(spark):
    verts = spark.createDataFrame([(i,) for i in range(5)], ["id"])
    edges = spark.createDataFrame([(1, 3)], ["src", "dst"])
    comp = {
        r["id"]: r["component"]
        for r in connected_components_star(verts, edges).collect()
    }
    assert comp == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4}


def test_nonconvergence_raises_not_silent(spark):
    # diameter 5 chain with max_iter=2: labels would be wrong — the
    # operator must refuse (strict) or warn (strict=False), never
    # silently return bad components
    import warnings

    import pytest

    verts = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, edges, max_iter=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(verts, edges, max_iter=2, strict=False)
    assert any("did not converge" in str(x.message) for x in w)


def test_isolated_vertices_are_own_component(spark):
    comp = _run(spark, 5, [(1, 3)])
    assert comp == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4}


def test_direction_irrelevant(spark):
    # edges given "backwards" — symmetrization must handle it
    a = _run(spark, 4, [(3, 2), (2, 1), (1, 0)])
    b = _run(spark, 4, [(0, 1), (1, 2), (2, 3)])
    assert a == b == {i: 0 for i in range(4)}


def test_two_cliques_bridge(spark):
    # two triangles joined by one bridge edge collapse to one component
    tri1 = [(0, 1), (1, 2), (2, 0)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    comp = _run(spark, 13, tri1 + tri2 + [(2, 10)])
    assert comp[0] == comp[12] == 0
    # the untouched vertices 3..9 stay singletons
    assert all(comp[i] == i for i in range(3, 10))


def test_canonical_keeper_selection(spark):
    """The downstream dedup pattern: keep rows where id == component."""
    comp = _run(spark, 6, [(0, 5), (1, 4)])
    keepers = sorted(k for k, c in comp.items() if k == c)
    assert keepers == [0, 1, 2, 3]


def test_reliable_checkpoint_option(spark, tmp_path):
    """reliable=True routes lineage cuts through checkpoint() against
    the configured checkpoint dir — the cluster-durable setting
    (executor loss after a localCheckpoint truncation kills the job at
    scale). Same labels as the local default, and files actually land
    in the checkpoint dir."""
    import os

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    verts = spark.createDataFrame([(i,) for i in range(8)], ["id"])
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (6, 7)], ["src", "dst"]
    )
    want = {r["id"]: r["component"]
            for r in connected_components(verts, edges).collect()}
    got = {r["id"]: r["component"]
           for r in connected_components(verts, edges, reliable=True).collect()}
    got_star = {
        r["id"]: r["component"]
        for r in connected_components_star(
            verts, edges, reliable=True
        ).collect()
    }
    assert got == want and got_star == want
    ckpt_files = [
        f for _, _, fs in os.walk(str(tmp_path / "ckpt")) for f in fs
    ]
    assert ckpt_files, "reliable=True wrote nothing to the checkpoint dir"
