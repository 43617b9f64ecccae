"""Partitioned probabilistic seen-set: build & probe as DataFrame ops
(SURVEY.md §3.2 filter-build / filter-probe stages).

Layout: the key space is sharded by ``partition_id = pmod(url_hash, P)``
with ``P`` fixed at crawl init (recorded in the snapshot manifest;
resharding is an explicit rebuild job — SURVEY.md §7 "what's hard").
The ``seen_set`` blob table holds one bloom + one cuckoo blob per
partition: ``(partition_id int, kind string, filter binary,
n_keys long, wave int)``.

Scale shape: both build and probe use ``cogroup().applyInPandas`` so
each task sees ONE partition's candidate rows and that partition's
blob — nothing is broadcast, nothing is collected to the driver, and
the shuffle is the same hash-partitioning the anti-join needs anyway
(exchange reuse). The dedupe contract stays exact: a bloom MISS is
proof-of-novelty (no false negatives); only bloom HITS proceed to the
exact anti-join, which resolves the false positives. The cuckoo filter
is the approximate fast path (``exact=False``) for 10^10-frontier
telemetry and for accepted-FPR dedupe, and supports deletes (recrawl
invalidation).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..filters import BloomFilter, CuckooFilter
from .dedupe import anti_join_seen, anti_join_seen_parts

DEFAULT_P = 16
#: ``link_id`` is the blob's stable position in its partition's
#: scalable-filter chain: updates to the newest link re-emit the SAME
#: link_id at a later wave, appends get max+1 — so a union of per-wave
#: deltas reconstructs the current chain by "latest wave per
#: (partition_id, kind, link_id)" (``merge_blob_links``).
BLOB_SCHEMA = (
    "partition_id int, kind string, filter binary, n_keys long, wave int, "
    "link_id int"
)


def pid_col(key=None, p: int = DEFAULT_P):
    if key is None:
        key = F.col("url_hash")
    return F.pmod(key, F.lit(p)).cast("int")


def build_seen_blobs(
    seen: DataFrame,
    p: int = DEFAULT_P,
    wave: int = 0,
    capacity: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """seen(url_hash) → one bloom + one cuckoo blob per hash-partition."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["url_hash"].to_numpy()
        cap = capacity or max(64, 2 * len(keys))
        pid = int(pdf["partition_id"].iloc[0]) if len(pdf) else -1
        bloom = BloomFilter(cap, fpp)
        bloom.add(keys)
        cuckoo = CuckooFilter(cap)
        cuckoo.add(keys)
        return pd.DataFrame(
            {
                "partition_id": [pid, pid],
                "kind": ["bloom", "cuckoo"],
                "filter": [bloom.to_bytes(), cuckoo.to_bytes()],
                "n_keys": [len(keys), len(keys)],
                "wave": [wave, wave],
                "link_id": [0, 0],
            }
        )

    keyed = seen.select("url_hash").withColumn("partition_id", pid_col(p=p))
    return keyed.groupBy("partition_id").applyInPandas(_build, BLOB_SCHEMA)


def update_seen_blobs(
    blobs: DataFrame,
    delta: DataFrame,
    p: int = DEFAULT_P,
    wave: int = 0,
    fpp: float = 0.01,
    emit_delta: bool = False,
) -> DataFrame:
    """Incrementally fold a wave's NEW keys into the per-partition blobs
    — the scale fix for "rebuild every blob from the full seen set each
    wave" (O(corpus) per wave → O(delta) per wave).

    Per partition, per kind: insert the delta keys into the newest blob
    if it has headroom (bloom: n ≤ m·ln2/k estimated capacity; cuckoo:
    ≤50% projected load); otherwise append a NEW blob sized for
    max(2×delta, 2×previous) — a scalable-filter chain, ≤O(log n) blobs
    per partition, probed with OR (see ``_probe_kernel``). Only the
    newest blob is ever deserialized. No false negatives in any path.

    ``emit_delta=False`` returns the FULL updated blob table (older
    chain links pass through untouched). ``emit_delta=True`` returns
    ONLY the new/updated links — at 10^10 keys the full table is ~GBs
    of blob bytes while the per-wave change is one link per partition,
    so an append-only snapshot store should persist just the delta and
    reconstruct the table with :func:`merge_blob_links` (same chain
    identity via ``link_id``; a delta-emit ∪ merge round-trip is
    pytest-pinned equal to the full emit).
    """
    import math

    def _upd(dpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        cols = ("partition_id", "kind", "filter", "n_keys", "wave", "link_id")
        if len(dpdf) == 0:
            # no new keys for this partition: full mode passes the
            # chain through; delta mode has nothing to report
            if emit_delta:
                return pd.DataFrame({c: [] for c in cols})
            return bpdf[list(cols)]
        pid = int(dpdf["partition_id"].iloc[0])
        keys = dpdf["url_hash"].to_numpy()
        out = {c: [] for c in cols}

        def emit(kind_, blob_, n_, wave_, link_):
            out["partition_id"].append(pid)
            out["kind"].append(kind_)
            out["filter"].append(blob_)
            out["n_keys"].append(n_)
            out["wave"].append(wave_)
            out["link_id"].append(link_)

        for kind in ("bloom", "cuckoo"):
            rows = bpdf[bpdf["kind"] == kind].sort_values("link_id")
            if not emit_delta:
                # older chain links: pass through untouched
                for _, r in rows.iloc[:-1].iterrows():
                    emit(kind, r["filter"], r["n_keys"], r["wave"],
                         r["link_id"])
            newest = rows.iloc[-1] if len(rows) else None
            newest_id = int(newest["link_id"]) if newest is not None else 0
            if kind == "bloom":
                f = (
                    BloomFilter.from_bytes(bytes(newest["filter"]))
                    if newest is not None
                    else BloomFilter(max(64, 2 * len(keys)), fpp)
                )
                cap = int(f.m * math.log(2) / f.k)  # n at which FPR hits fpp
                if f.n + len(keys) <= cap:
                    f.add(keys)
                    emit(kind, f.to_bytes(), f.n, wave, newest_id)
                else:
                    if newest is not None and not emit_delta:
                        emit(kind, newest["filter"], newest["n_keys"],
                             newest["wave"], newest_id)
                    g = BloomFilter(max(64, 2 * len(keys), 2 * cap), fpp)
                    g.add(keys)
                    emit(kind, g.to_bytes(), g.n, wave,
                         newest_id + 1 if newest is not None else 0)
            else:
                f = (
                    CuckooFilter.from_bytes(bytes(newest["filter"]))
                    if newest is not None
                    else CuckooFilter(max(64, 2 * len(keys)))
                )
                slots = f.n_buckets * 4  # SLOTS
                ok = 0
                if 2 * (f.n + len(keys)) <= slots:  # keep ≤50% load
                    ok = f.add(keys)
                if ok == len(keys):
                    emit(kind, f.to_bytes(), f.n, wave, newest_id)
                else:
                    # no headroom (or rare eviction failure — rejected
                    # subset unknown): keep old blob, start a fresh one
                    # holding the WHOLE delta. Duplicate fingerprints
                    # are membership-harmless.
                    if newest is not None and not emit_delta:
                        emit(kind, newest["filter"], newest["n_keys"],
                             newest["wave"], newest_id)
                    g = CuckooFilter(max(64, 2 * len(keys), slots))
                    g.add(keys)
                    emit(kind, g.to_bytes(), g.n, wave,
                         newest_id + 1 if newest is not None else 0)
        return pd.DataFrame(out)

    keyed = delta.select("url_hash").withColumn("partition_id", pid_col(p=p))
    return (
        keyed.groupBy("partition_id")
        .cogroup(blobs.groupBy("partition_id"))
        .applyInPandas(_upd, BLOB_SCHEMA)
    )


def merge_blob_links(parts: list[DataFrame]) -> DataFrame:
    """Reconstruct the current blob table from per-wave deltas: the
    newest version (max wave) of each chain link wins. The frame is
    tiny — P partitions × 2 kinds × O(log n) links per delta — so the
    window is driver-negligible at any corpus scale; the heavy bytes
    (the blobs themselves) are never rewritten by this merge."""
    from pyspark.sql import Window

    allb = parts[0]
    for prt in parts[1:]:
        allb = allb.unionByName(prt)
    w = Window.partitionBy("partition_id", "kind", "link_id").orderBy(
        F.desc("wave")
    )
    return (
        allb.withColumn("_mb_r", F.row_number().over(w))
        .filter(F.col("_mb_r") == 1)
        .drop("_mb_r")
    )


def _probe_kernel(kind: str):
    def probe(cand: pd.DataFrame, blobs: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return cand.assign(maybe_seen=pd.Series([], dtype=bool))
        rows = blobs[blobs["kind"] == kind]
        if len(rows) == 0:  # no blob for this partition → nothing seen
            return cand.assign(maybe_seen=False)
        # a partition may carry a CHAIN of blobs (scalable-filter growth
        # under incremental updates); membership = OR across the chain —
        # still no false negatives, FPR sums over ≤O(log n) blobs
        keys = cand["url_hash"].to_numpy()
        import numpy as np

        acc = np.zeros(len(cand), dtype=bool)
        for blob in rows["filter"]:
            f = (
                BloomFilter.from_bytes(bytes(blob))
                if kind == "bloom"
                else CuckooFilter.from_bytes(bytes(blob))
            )
            acc |= f.contains(keys)
        return cand.assign(maybe_seen=acc)

    return probe


def probe_seen_blobs(
    candidates: DataFrame,
    blobs: DataFrame,
    p: int = DEFAULT_P,
    kind: str = "bloom",
) -> DataFrame:
    """candidates + ``maybe_seen`` bool via co-partitioned blob probe."""
    out_schema = ", ".join(
        f"{f_.name} {f_.dataType.simpleString()}" for f_ in candidates.schema.fields
    ) + ", maybe_seen boolean"
    keyed = candidates.withColumn("partition_id", pid_col(p=p))
    probed = (
        keyed.groupBy("partition_id")
        .cogroup(blobs.groupBy("partition_id"))
        .applyInPandas(
            lambda c, b: _probe_kernel(kind)(
                c.drop(columns=["partition_id"]), b
            ),
            out_schema,
        )
    )
    return probed


def dedupe_against_seen(
    candidates: DataFrame,
    seen: DataFrame | list[DataFrame],
    blobs: DataFrame | None = None,
    p: int = DEFAULT_P,
    exact: bool = True,
) -> DataFrame:
    """The full A7 dedupe: bloom pre-check → exact anti-join confirm.

    - ``blobs is None``: plain exact anti-join (M1 behavior).
    - ``exact=True`` (default): bloom-miss rows pass through free of
      charge; only bloom-hit rows (seen ∪ false positives) pay the
      anti-join. Result is IDENTICAL to the exact anti-join — property
      the tests pin.
    - ``exact=False``: cuckoo verdict decides (documented FPR; for
      at-scale modes where dropping ~fpp of novel URLs is acceptable).

    ``seen`` may be a LIST of physical parts (compacted bucketed table
    + post-compaction deltas, Crawl.compact): the confirm join then
    chains per part, so the compacted part joins without a seen-side
    exchange and the deltas broadcast — at 10^10 keys this is the
    difference between shuffling the corpus every wave and shuffling
    only the suspects."""
    parts = seen if isinstance(seen, list) else [seen]
    if blobs is None:
        return anti_join_seen_parts(candidates, parts)
    kind = "bloom" if exact else "cuckoo"
    probed = probe_seen_blobs(candidates, blobs, p=p, kind=kind)
    if not exact:
        return probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    # Materialize the probe behind ONE exchange before branching:
    # filter branches only reuse *exchanges*, so without this the
    # Python cogroup probe would re-run per branch (2× the bloom CPU
    # over every candidate). Hashing by url_hash also hands the
    # suspects to the anti-join already co-partitioned on its key.
    probed = probed.repartition(F.col("url_hash"))
    clear = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_novel = anti_join_seen_parts(suspects, parts)
    return clear.unionByName(confirmed_novel)
