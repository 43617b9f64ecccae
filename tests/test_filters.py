"""Bloom/cuckoo property tests (SURVEY.md §5.2 item 3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tweetf0rm_spark.filters import BloomFilter, CuckooFilter

keys_st = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    min_size=0,
    max_size=500,
    unique=True,
)


@settings(max_examples=50, deadline=None)
@given(keys=keys_st)
def test_bloom_no_false_negatives(keys):
    b = BloomFilter(max(1, len(keys)), 0.01)
    b.add(keys)
    if keys:
        assert b.contains(keys).all()


@settings(max_examples=20, deadline=None)
@given(keys=keys_st)
def test_bloom_serde_roundtrip(keys):
    b = BloomFilter(max(1, len(keys)), 0.01)
    b.add(keys)
    b2 = BloomFilter.from_bytes(b.to_bytes())
    assert b2.m == b.m and b2.k == b.k and b2.n == b.n
    if keys:
        assert b2.contains(keys).all()


def test_bloom_fpp_bound():
    rng = np.random.default_rng(1)
    keys = rng.integers(-(2**62), 2**62, 100_000, dtype=np.int64)
    other = np.setdiff1d(
        rng.integers(-(2**62), 2**62, 100_000, dtype=np.int64), keys
    )
    b = BloomFilter(len(keys), 0.01)
    b.add(keys)
    assert b.contains(other).mean() < 0.02  # 2× headroom over target


def test_bloom_union():
    a, b = BloomFilter(1000, 0.01), BloomFilter(1000, 0.01)
    a.add([1, 2, 3])
    b.add([4, 5, 6])
    u = a.union(b)
    assert u.contains(np.array([1, 2, 3, 4, 5, 6])).all()


@settings(max_examples=50, deadline=None)
@given(keys=keys_st)
def test_cuckoo_no_false_negatives(keys):
    c = CuckooFilter(max(1, len(keys)))
    ok = c.add(keys)
    assert ok == len(keys)  # sized at 50% load → no rejects
    if keys:
        assert c.contains(keys).all()


@settings(max_examples=20, deadline=None)
@given(keys=keys_st)
def test_cuckoo_serde_roundtrip(keys):
    c = CuckooFilter(max(1, len(keys)))
    c.add(keys)
    c2 = CuckooFilter.from_bytes(c.to_bytes())
    if keys:
        assert c2.contains(keys).all()


def test_cuckoo_delete_roundtrip():
    rng = np.random.default_rng(2)
    keys = np.unique(rng.integers(-(2**62), 2**62, 20_000, dtype=np.int64))
    c = CuckooFilter(len(keys))
    assert c.add(keys) == len(keys)
    gone, kept = keys[:5000], keys[5000:]
    assert c.delete(gone) == len(gone)
    assert c.contains(kept).all()  # deletes never break other keys


def test_cuckoo_fpr_low():
    rng = np.random.default_rng(3)
    keys = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    other = np.setdiff1d(
        rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64), keys
    )
    c = CuckooFilter(len(keys))
    c.add(keys)
    assert c.contains(other).mean() < 0.002  # 16-bit fp, 2 buckets
