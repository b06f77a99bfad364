"""Varint/delta block codec roundtrips (SURVEY §5.3 operator units)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from similarities_spark.index import codec


def test_varint_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**56], dtype=np.uint64)
    assert list(codec.varint_decode(codec.varint_encode(vals))) == list(vals)


def test_varint_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300)
)
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(arr))
    assert list(out) == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),  # doc id gap
            st.integers(min_value=1, max_value=1000),  # tf
            st.integers(min_value=1, max_value=100000),  # dl
        ),
        min_size=1,
        max_size=500,
    )
)
def test_block_roundtrip_property(postings):
    gaps = np.array([p[0] for p in postings], dtype=np.int64)
    doc_ids = np.cumsum(gaps + 1) - 1  # strictly increasing
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    payload = codec.encode_block(doc_ids, tfs, dls)
    d2, t2, l2 = codec.decode_block(payload)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)


def test_contribs_matches_reference_expression():
    tf = np.array([1, 2, 5], dtype=np.int64)
    dl = np.array([10, 20, 7], dtype=np.int64)
    idf, avgdl, k1, b = 1.7, 12.5, 1.5, 0.75
    got = codec.contribs(tf, dl, idf, avgdl, k1, b)
    tf_f = tf.astype(np.float64)
    dl_f = dl.astype(np.float64)
    want = idf * (tf_f * (k1 + 1) / (tf_f + k1 * (1 - b + b * dl_f / avgdl)))
    assert np.array_equal(got, want)  # bit-identical


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2**30),
                st.integers(min_value=1, max_value=50),
                st.integers(min_value=1, max_value=500),
            ),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_batch_decode_equals_per_block(blocks):
    payloads, counts, want_ids, want_tfs, want_dls = [], [], [], [], []
    for blk in blocks:
        gaps = np.array([p[0] for p in blk], dtype=np.int64)
        ids = np.cumsum(gaps + 1) - 1
        tfs = np.array([p[1] for p in blk], dtype=np.int64)
        dls = np.array([p[2] for p in blk], dtype=np.int64)
        payloads.append(codec.encode_block(ids, tfs, dls))
        counts.append(len(blk))
        want_ids.append(ids)
        want_tfs.append(tfs)
        want_dls.append(dls)
    got_ids, got_tfs, got_dls = codec.decode_blocks_batch(payloads, counts)
    assert np.array_equal(got_ids, np.concatenate(want_ids))
    assert np.array_equal(got_tfs, np.concatenate(want_tfs))
    assert np.array_equal(got_dls, np.concatenate(want_dls))
