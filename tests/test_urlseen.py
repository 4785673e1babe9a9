"""Unit tests for the Bloom / cuckoo URL-seen structures (no Spark)."""

from __future__ import annotations

import numpy as np

from fide_crawler_spark.operators.urlseen import CuckooFilter, PartitionedBloom


def _hashes(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_bloom_no_false_negatives():
    bf = PartitionedBloom(n_parts=4, bits_per_part=1 << 16, k=5)
    added = _hashes(5000, 1)
    bf.add_hashes(added)
    assert bf.might_contain(added).all()


def test_bloom_low_false_positive_rate():
    bf = PartitionedBloom(n_parts=4, bits_per_part=1 << 18, k=5)
    bf.add_hashes(_hashes(10000, 2))
    other = _hashes(10000, 3)
    fpp = bf.might_contain(other).mean()
    assert fpp < 0.02, f"fpp too high: {fpp}"


def test_bloom_roundtrip_and_merge():
    a = PartitionedBloom(n_parts=4, bits_per_part=1 << 14, k=3)
    b = PartitionedBloom(n_parts=4, bits_per_part=1 << 14, k=3)
    ha, hb = _hashes(100, 4), _hashes(100, 5)
    a.add_hashes(ha)
    b.add_hashes(hb)
    a2 = PartitionedBloom.from_bytes(a.to_bytes())
    assert a2.might_contain(ha).all()
    a2.merge(b)
    assert a2.might_contain(hb).all()


def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter(n_buckets=1 << 12)
    hs = [int(h) for h in _hashes(2000, 6)]
    for h in hs:
        assert cf.insert(h)
    assert all(cf.contains(h) for h in hs)
    for h in hs[:500]:
        assert cf.delete(h)
    # deleted fingerprints gone (modulo fp collisions from remaining items)
    still = sum(cf.contains(h) for h in hs[:500])
    assert still < 50
    assert all(cf.contains(h) for h in hs[500:])


def test_cuckoo_roundtrip():
    cf = CuckooFilter(n_buckets=1 << 10)
    hs = [int(h) for h in _hashes(500, 7)]
    for h in hs:
        cf.insert(h)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert all(cf2.contains(h) for h in hs)
