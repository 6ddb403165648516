"""Codec round-trip tests incl. the FIXTURES.md §5 edge gaps + hypothesis."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mithril_spark.codec import (
    BLOCK_SIZE,
    decode_position_block,
    decode_posting_block,
    decode_vbyte,
    delta_decode,
    delta_encode,
    encode_position_block,
    encode_posting_blocks,
    encode_vbyte,
    pack_words,
    unpack_words,
)


def test_edge_gaps():
    gaps = np.array([1, 127, 128, 16383, 16384, 2**28 - 1, 2**28], np.uint32)
    docs = np.cumsum(gaps).astype(np.uint32)
    assert np.array_equal(delta_decode(delta_encode(docs)), docs)


def test_empty():
    assert encode_vbyte(np.empty(0, np.uint32)) == b""
    assert decode_vbyte(b"").size == 0
    assert delta_decode(delta_encode(np.empty(0, np.uint32))).size == 0


def test_extreme_values():
    vals = np.array([0, 1, 2**32 - 1, 2**31, 127, 128], np.uint32)
    assert np.array_equal(decode_vbyte(encode_vbyte(vals)), vals)


@given(
    st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=300)
)
@settings(max_examples=50, deadline=None)
def test_vbyte_roundtrip_property(values):
    arr = np.array(values, dtype=np.uint32)
    assert np.array_equal(decode_vbyte(encode_vbyte(arr)), arr)


@given(
    st.sets(st.integers(min_value=0, max_value=2**31), max_size=400)
)
@settings(max_examples=50, deadline=None)
def test_posting_blocks_property(doc_set):
    docs = np.array(sorted(doc_set), dtype=np.uint32)
    freqs = (docs % 7 + 1).astype(np.uint32)
    blocks = list(encode_posting_blocks(docs, freqs))
    assert all(b["doc_count"] <= BLOCK_SIZE for b in blocks)
    if docs.size:
        got_d, got_f = [], []
        for b in blocks:
            d, f = decode_posting_block(b["doc_ids_enc"], b["freqs_enc"])
            assert b["first_doc_id"] == d[0] and b["last_doc_id"] == d[-1]
            assert b["max_freq"] == f.max() and b["freq_sum"] == f.sum()
            got_d.append(d)
            got_f.append(f)
        assert np.array_equal(np.concatenate(got_d), docs)
        assert np.array_equal(np.concatenate(got_f), freqs)


def test_position_block_roundtrip():
    doc_ids = np.array([3, 10, 55, 56], np.uint32)
    flags = np.array([1, 3, 17, 2], np.uint32)
    poss = [
        np.array([1, 5, 9], np.uint32),
        np.array([], np.uint32),
        np.array([0, 65534], np.uint32),
        np.array([7], np.uint32),
    ]
    blk = encode_position_block(doc_ids, flags, poss)
    d, f, p = decode_position_block(
        blk["doc_ids_enc"], blk["flags_enc"], blk["pos_counts_enc"], blk["positions_enc"]
    )
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(f, flags)
    for a, b in zip(poss, p):
        assert np.array_equal(a, b)


def test_position_block_all_empty_lists():
    """A run where EVERY doc has zero positions is legal (zero-count docs
    are part of the format) and must round-trip — the encoder used to
    raise IndexError on it because it guarded the delta pass on list
    truthiness instead of total position count (code-review r5)."""
    doc_ids = np.array([4, 9], np.uint32)
    flags = np.array([2, 5], np.uint32)
    poss = [np.array([], np.uint32), np.array([], np.uint32)]
    blk = encode_position_block(doc_ids, flags, poss)
    assert blk["positions_enc"] == b""
    d, f, p = decode_position_block(
        blk["doc_ids_enc"], blk["flags_enc"], blk["pos_counts_enc"], blk["positions_enc"]
    )
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(f, flags)
    assert [len(x) for x in p] == [0, 0]


def test_pack_words():
    words = [b"", b"abc", b"\x00\xff" * 5, "café".encode()]
    assert unpack_words(pack_words(words)) == words
    assert unpack_words(b"") == []
