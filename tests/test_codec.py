from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_retrieval_and_search_engines_spark.functions import codec


def test_vb_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**40, 2**62], dtype=np.uint64)
    assert np.array_equal(codec.vb_decode(codec.vb_encode(vals)), vals)


def test_vb_empty():
    assert codec.vb_encode(np.array([], dtype=np.uint64)).size == 0
    assert codec.vb_decode(np.array([], dtype=np.uint8)).size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_vb_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.vb_decode(codec.vb_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=0, max_size=300,
             unique=True),
    st.integers(min_value=0, max_value=1000),
)
def test_postings_roundtrip_property(docids, range_start):
    docids = np.sort(np.array(docids, dtype=np.int64)) + range_start
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 1000, size=docids.size).astype(np.int64)
    dls = rng.integers(1, 10000, size=docids.size).astype(np.int64)
    payload = codec.encode_postings(docids, tfs, dls, range_start=range_start)
    d2, t2, l2 = codec.decode_postings(payload, range_start=range_start)
    assert np.array_equal(d2, docids)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)


def test_block_max_bound_validity():
    """Block upper bound >= every true in-block score for arbitrary k1, b."""
    rng = np.random.default_rng(3)
    n = 1000
    docids = np.cumsum(rng.integers(1, 50, n)).astype(np.int64)
    tfs = rng.integers(1, 30, n).astype(np.int64)
    dls = rng.integers(5, 5000, n).astype(np.int64)
    bl, btf, bdl = codec.block_max_meta(docids, tfs, dls, block=128)
    avgdl = 321.5
    for k1, b in [(0.9, 0.4), (1.2, 0.75), (0.1, 0.0), (2.0, 1.0)]:
        true = codec.bm25_tf_norm(tfs, dls, k1, b, avgdl)
        bound = codec.bm25_tf_norm(btf, bdl, k1, b, avgdl)
        for blk in range(len(bl)):
            lo, hi = blk * 128, min((blk + 1) * 128, n)
            assert true[lo:hi].max() <= bound[blk] + 1e-15
        assert np.array_equal(bl, docids[np.minimum(
            np.arange(0, n, 128) + 127, n - 1)])


def test_encode_empty_postings():
    payload = codec.encode_postings(
        np.array([], dtype=np.int64), np.array([], dtype=np.int64),
        np.array([], dtype=np.int64))
    d, t, l = codec.decode_postings(payload)
    assert d.size == t.size == l.size == 0


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000])
def test_block_meta_shapes(n):
    docids = np.arange(n, dtype=np.int64) * 3 + 5
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 7, dtype=np.int64)
    bl, btf, bdl = codec.block_max_meta(docids, tfs, dls, block=128)
    assert len(bl) == (n + 127) // 128
    assert bl[-1] == docids[-1]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=0,
             max_size=400, unique=True),
    st.integers(min_value=0, max_value=100),
    st.sampled_from([8, 128]),
)
def test_encode_chunk_matches_separate_calls(docids, range_start, block):
    """encode_chunk (the fused build/compact kernel) must produce byte- and
    value-identical output to encode_postings + block_max_meta +
    block_offsets."""
    docids = np.sort(np.array(docids, dtype=np.int64)) + range_start
    rng = np.random.default_rng(3)
    tfs = rng.integers(1, 300, size=docids.size).astype(np.int64)
    dls = rng.integers(1, 5000, size=docids.size).astype(np.int64)
    payload, bl, btf, bdl, go, to, do = codec.encode_chunk(
        docids, tfs, dls, range_start=range_start, block=block)
    assert payload == codec.encode_postings(docids, tfs, dls,
                                            range_start=range_start)
    bl0, btf0, bdl0 = codec.block_max_meta(docids, tfs, dls, block=block)
    go0, to0, do0 = codec.block_offsets(docids, tfs, dls,
                                        range_start=range_start, block=block)
    for a, b in [(bl, bl0), (btf, btf0), (bdl, bdl0),
                 (go, go0), (to, to0), (do, do0)]:
        assert np.array_equal(np.asarray(a), np.asarray(b))
