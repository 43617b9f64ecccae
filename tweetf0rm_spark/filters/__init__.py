"""Probabilistic seen-set state (SURVEY.md §2.A A7, BASELINE.json:L6
"partitioned cuckoo-filter URL-seen set (with bloom-filter pre-check)").

The reference keeps its seen-set in a redis SET (O(1) membership,
single node). At 10^10 URLs that's ~80 GB of raw keys — too big to
broadcast, too hot for one node. The engine shards the seen-set into
P hash-partitions keyed by ``pmod(url_hash, P)``; each partition owns

- a **bloom filter** (numpy bit array): cheap map-side pre-check that
  eliminates the bulk of already-seen candidates before any shuffle;
- a **cuckoo filter** (numpy bucket table): the authoritative
  probabilistic membership state — supports deletes (recrawl
  invalidation), ~2-4x denser than bloom at equal FPR.

Both are pure numpy (vectorized probe over Arrow batches — no per-row
Python), serialized as self-describing binary blobs stored in the
``seen_set`` table (partition_id, kind, filter, n_keys, wave).
Exact anti-join remains the correctness backstop: filters only
pre-filter; survivors confirm against the key table (no false
negatives ⇒ nothing seen is ever refetched *because of* a filter).
"""

from .bloom import BloomFilter
from .cuckoo import CuckooFilter

__all__ = ["BloomFilter", "CuckooFilter"]
