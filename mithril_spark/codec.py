"""Vectorized varbyte/delta block codec (numpy, no per-row Python).

Byte convention matches the reference decoder (TermReader.cpp:115-129 /
index/src/Utils.h): little-endian 7-bit groups, low group first, 0x80
continuation bit set on every byte except the last of a value.

Postings are stored as fixed-size blocks (BLOCK_SIZE=128 docs, the
reference's sync-point interval, index/src/TermStore.h:23) with per-block
``first/last_doc_id`` + ``max_freq`` metadata: the Spark-era equivalent of
sync points (seek = block skip via min/max, cf. InvertedIndex.cpp:393-403)
and the block-max metadata used for WAND-style pruning.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def vbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value — layout-coupled to ``encode_vbyte``.

    Exposed so multi-group encoders can vbyte a whole concatenated stream
    once and slice per-group payloads at byte offsets (vbyte is per-value
    independent, so slices equal per-group encodes byte-for-byte)."""
    v = np.asarray(values, dtype=np.uint64)
    return (
        1
        + (v >= 1 << 7).astype(np.int64)
        + (v >= 1 << 14).astype(np.int64)
        + (v >= 1 << 21).astype(np.int64)
        + (v >= 1 << 28).astype(np.int64)
    )


def encode_vbyte(values: np.ndarray) -> bytes:
    """Encode a uint32 array to varbyte bytes."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = vbyte_lengths(v)
    total = int(nbytes.sum())
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    owner = np.repeat(np.arange(v.size), nbytes)
    j = np.arange(total) - starts[owner]
    out = ((v[owner] >> (7 * j.astype(np.uint64))) & 0x7F).astype(np.uint8)
    out[j < (nbytes[owner] - 1)] |= 0x80
    return out.tobytes()


def decode_vbyte(buf: bytes) -> np.ndarray:
    """Decode varbyte bytes back to a uint32 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint32)
    term_idx = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(term_idx)
    starts[0] = 0
    starts[1:] = term_idx[:-1] + 1
    lengths = term_idx - starts + 1
    owner_starts = np.repeat(starts, lengths)
    within = np.arange(b.size) - owner_starts
    parts = (b & 0x7F).astype(np.uint64) << (7 * within.astype(np.uint64))
    out = np.add.reduceat(parts, starts)
    return out.astype(np.uint32)


def delta_encode(sorted_values: np.ndarray) -> bytes:
    """First value absolute, then gaps; input must be ascending."""
    v = np.asarray(sorted_values, dtype=np.uint32)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return encode_vbyte(deltas)


def delta_decode(buf: bytes) -> np.ndarray:
    deltas = decode_vbyte(buf)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas.astype(np.uint64)).astype(np.uint32)


def encode_posting_blocks(
    doc_ids: np.ndarray, freqs: np.ndarray, tf_norms: np.ndarray | None = None
):
    """Chunk one (term, shard[, salt-range]) posting run into encoded blocks.

    Yields dicts: block_id (ordinal within this run), doc_count, first/last
    doc id, max_freq, per-block max normalized tf (``max_tfn`` — the tight
    block-max score metadata for WAND; falls back to the loose
    ``max_freq / (1-b)`` bound when per-doc body lengths aren't supplied),
    and the two varbyte payloads.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint32)
    freqs = np.asarray(freqs, dtype=np.uint32)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    freqs = freqs[order]
    if tf_norms is None:
        tf_norms = freqs.astype(np.float64) / 0.25  # (1-b) floor, b=0.75
    else:
        tf_norms = np.asarray(tf_norms, dtype=np.float64)[order]
    for b, start in enumerate(range(0, doc_ids.size, BLOCK_SIZE)):
        d = doc_ids[start : start + BLOCK_SIZE]
        f = freqs[start : start + BLOCK_SIZE]
        t = tf_norms[start : start + BLOCK_SIZE]
        yield {
            "block_id": b,
            "doc_count": int(d.size),
            "first_doc_id": int(d[0]),
            "last_doc_id": int(d[-1]),
            "max_freq": int(f.max()),
            "max_tfn": float(t.max()),
            "freq_sum": int(f.sum()),
            "doc_ids_enc": delta_encode(d),
            "freqs_enc": encode_vbyte(f),
        }


def decode_posting_block(doc_ids_enc: bytes, freqs_enc: bytes):
    return delta_decode(doc_ids_enc), decode_vbyte(freqs_enc)


def encode_position_block(
    doc_ids: np.ndarray, flags: np.ndarray, positions: list[np.ndarray]
):
    """Encode one (term, shard[, salt]) run of per-doc position lists.

    Per-doc positions are delta-encoded (PositionIndex.cpp:176-183) and
    concatenated; ``pos_counts_enc`` holds each doc's position count.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint32)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    flags = np.asarray(flags, dtype=np.uint32)[order]
    positions = [positions[i] for i in order]
    counts = np.fromiter((len(p) for p in positions), dtype=np.uint32, count=len(positions))
    allpos = (
        np.concatenate([np.asarray(p, dtype=np.uint32) for p in positions])
        if positions else np.empty(0, dtype=np.uint32)
    )
    # guard on total position count, not list truthiness: a run where
    # EVERY doc has an empty list is legal (zero-count docs are part of
    # the format and the decoder handles them) and must encode as b""
    if allpos.size:
        # per-doc delta encoding: subtract previous position within each doc
        prev = np.empty_like(allpos)
        prev[0] = 0
        prev[1:] = allpos[:-1]
        doc_starts = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
        prev[doc_starts[counts > 0]] = 0
        deltas = allpos - prev
        positions_enc = encode_vbyte(deltas)
    else:
        positions_enc = b""
    return {
        "doc_count": int(doc_ids.size),
        "first_doc_id": int(doc_ids[0]) if doc_ids.size else 0,
        "last_doc_id": int(doc_ids[-1]) if doc_ids.size else 0,
        "doc_ids_enc": delta_encode(doc_ids),
        "flags_enc": encode_vbyte(flags),
        "pos_counts_enc": encode_vbyte(counts),
        "positions_enc": positions_enc,
    }


def decode_position_block(
    doc_ids_enc: bytes, flags_enc: bytes, pos_counts_enc: bytes, positions_enc: bytes
):
    """Returns (doc_ids, flags, list-of-position-arrays)."""
    doc_ids = delta_decode(doc_ids_enc)
    flags = decode_vbyte(flags_enc)
    counts = decode_vbyte(pos_counts_enc)
    deltas = decode_vbyte(positions_enc)
    if deltas.size:
        ends = np.cumsum(counts.astype(np.int64))
        starts = ends - counts
        absolute = np.cumsum(deltas.astype(np.uint64))
        # re-anchor each doc's run: subtract the running total before its start
        base = np.zeros(len(counts), dtype=np.uint64)
        nz = counts > 0
        base[nz] = np.where(starts[nz] > 0, absolute[starts[nz] - 1], 0)
        out = [
            (absolute[s:e] - b).astype(np.uint32)
            for s, e, b in zip(starts, ends, base)
        ]
    else:
        out = [np.empty(0, dtype=np.uint32) for _ in counts]
    return doc_ids, flags, out


def pack_words(words) -> bytes:
    """Length-prefixed packing of a list of byte-strings into one binary."""
    out = bytearray()
    for w in words:
        out += len(w).to_bytes(4, "big")
        out += w
    return bytes(out)


def unpack_words(buf: bytes) -> list[bytes]:
    out = []
    i = 0
    n = len(buf)
    while i < n:
        ln = int.from_bytes(buf[i : i + 4], "big")
        i += 4
        out.append(buf[i : i + ln])
        i += ln
    return out
