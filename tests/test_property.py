"""Property-based tests (hypothesis) for the pure-Python kernels the
distributed operators are built on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fide_crawler_spark.fixtures import parse_page, render_page, synth_spans
from fide_crawler_spark.operators.urlseen import CuckooFilter, PartitionedBloom

hashes = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=300
)


@settings(max_examples=50, deadline=None)
@given(hashes)
def test_bloom_never_false_negative(hs):
    bf = PartitionedBloom(n_parts=4, bits_per_part=1 << 12, k=3)
    arr = np.array(hs, dtype=np.uint64)
    bf.add_hashes(arr)
    assert bf.might_contain(arr).all()


@settings(max_examples=50, deadline=None)
@given(hashes)
def test_bloom_serialization_preserves_membership(hs):
    bf = PartitionedBloom(n_parts=2, bits_per_part=1 << 10, k=2)
    arr = np.array(hs, dtype=np.uint64)
    bf.add_hashes(arr)
    bf2 = PartitionedBloom.from_bytes(bf.to_bytes())
    assert (bf.might_contain(arr) == bf2.might_contain(arr)).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=0, max_size=200, unique=True))
def test_cuckoo_membership_after_inserts(hs):
    cf = CuckooFilter(1 << 10)
    inserted = [h for h in hs if cf.insert(h)]
    assert all(cf.contains(h) for h in inserted)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               min_size=1, max_size=60))
def test_render_parse_roundtrip(doc_id):
    spans = synth_spans(doc_id)
    parsed = parse_page(render_page(doc_id))
    assert parsed == [(s.kind, s.text, s.media_ref, s.offset) for s in spans]
    # offsets are exactly 0..n-1 (order is a data property)
    assert [p[3] for p in parsed] == list(range(len(parsed)))


@settings(max_examples=20, deadline=None)
@given(st.text(min_size=1, max_size=40), st.integers(min_value=1, max_value=4))
def test_synth_spans_deterministic_and_weight_scales(doc_id, w):
    a = synth_spans(doc_id, w)
    b = synth_spans(doc_id, w)
    assert a == b
    # weight multiplies block count → strictly more spans than weight 1
    if w > 1:
        assert len(a) > len(synth_spans(doc_id, 1))
