"""Vectorized == scalar posting-block emit.

`_make_posting_blocks` (one numpy pass per Arrow batch: lexsort + reduceat +
single sliced vbyte stream) must emit exactly the rows and payload bytes of
`_make_posting_blocks_scalar` (the row-wise reference implementation) for any
batch stream the upstream plan can produce: (term, shard, salt)-sorted rows,
groups split across arbitrary batch boundaries, multi-block groups, salts,
and shards missing from avg_body. No JVM needed — both are plain generators
over pandas DataFrames.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from mithril_spark.codec import BLOCK_SIZE, decode_vbyte, delta_decode
from mithril_spark.indexer import (
    _POSTING_DTYPES,
    _make_posting_blocks,
    _make_posting_blocks_scalar,
)


def _run(worker, batches):
    frames = [f for f in worker(iter(batches)) if len(f)]
    if not frames:
        return pd.DataFrame(
            {name: pd.Series(dtype=dt) for name, dt in _POSTING_DTYPES.items()}
        )
    out = pd.concat(frames, ignore_index=True)
    return out[list(_POSTING_DTYPES)]  # align column order; Spark matches by name


def _assert_same(batches, avg_body):
    a = _run(_make_posting_blocks_scalar(avg_body), batches)
    b = _run(_make_posting_blocks(avg_body), batches)
    assert len(a) == len(b), (len(a), len(b))
    for col in _POSTING_DTYPES:
        av, bv = list(a[col]), list(b[col])
        assert av == bv, (col, av[:5], bv[:5])


def _mk_batches(rows, batch_sizes):
    df = pd.DataFrame(
        rows, columns=["term", "shard", "salt", "doc_id", "freq", "body_len"]
    )
    out, i = [], 0
    for s in batch_sizes:
        out.append(df.iloc[i : i + s].reset_index(drop=True))
        i += s
    if i < len(df):
        out.append(df.iloc[i:].reset_index(drop=True))
    return out


def _random_rows(rng, n_terms, max_docs, shards=(0, 1), salts=(0, 1)):
    rows = []
    for t in range(n_terms):
        term = f"t{t:03d}"
        for shard in shards:
            for salt in salts:
                if rng.random() < 0.3:
                    continue
                ndocs = rng.randint(1, max_docs)
                docs = rng.sample(range(salt * 32768, salt * 32768 + 40000), ndocs)
                rng.shuffle(docs)  # scalar twin argsorts per group; so must we
                for d in docs:
                    rows.append(
                        (term, shard, salt, d, rng.randint(1, 900), rng.randint(0, 4000))
                    )
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vec_equals_scalar_random(seed):
    rng = random.Random(seed)
    rows = _random_rows(rng, n_terms=30, max_docs=40)
    sizes = []
    left = len(rows)
    while left > 0:
        s = rng.choice([1, 3, 7, 50, 200])
        sizes.append(min(s, left))
        left -= sizes[-1]
    avg_body = {0: 148.3, 1: 0.0}  # shard 1 exercises the avg<=0 norm=1 path
    _assert_same(_mk_batches(rows, sizes), avg_body)


def test_vec_multiblock_and_batch_spanning_group():
    """One group bigger than BLOCK_SIZE, split across many tiny batches."""
    rng = random.Random(7)
    docs = rng.sample(range(0, 9000), 3 * BLOCK_SIZE + 17)
    rows = [("big", 0, 0, d, rng.randint(1, 5), 1200) for d in docs]
    rows += [("z", 1, 0, 5, 2, 300)]
    _assert_same(_mk_batches(rows, [10] * 60), {0: 900.0, 1: 450.0})
    # and as one huge batch
    _assert_same(_mk_batches(rows, [len(rows)]), {0: 900.0, 1: 450.0})


def test_vec_empty_stream_and_empty_batches():
    empty = pd.DataFrame(
        {c: pd.Series(dtype=d) for c, d in zip(
            ["term", "shard", "salt", "doc_id", "freq", "body_len"],
            ["object", "int32", "int32", "int64", "int64", "int64"],
        )}
    )
    _assert_same([empty], {0: 1.0})
    _assert_same([empty, empty], {0: 1.0})


def test_vec_payloads_decode_round_trip():
    """The sliced payloads decode to the group's sorted docs and freqs."""
    rng = random.Random(11)
    rows = _random_rows(rng, n_terms=8, max_docs=300, shards=(0,), salts=(0,))
    out = _run(_make_posting_blocks({0: 100.0}), _mk_batches(rows, [97] * 40))
    df = pd.DataFrame(rows, columns=["term", "shard", "salt", "doc_id", "freq", "body_len"])
    for term, grp in df.groupby("term"):
        blocks = out[out["term"] == term].sort_values("block_id")
        got_docs = np.concatenate(
            [delta_decode(b) for b in blocks["doc_ids_enc"]]
        )
        got_freqs = np.concatenate(
            [decode_vbyte(b) for b in blocks["freqs_enc"]]
        )
        want = grp.sort_values("doc_id", kind="stable")
        assert got_docs.tolist() == want["doc_id"].tolist()
        assert got_freqs.tolist() == want["freq"].tolist()
        assert blocks["doc_count"].sum() == len(grp)


# ---------------------------------------------------------------------------
# positions: vectorized == scalar
# ---------------------------------------------------------------------------

import pyarrow as pa

from mithril_spark.indexer import _position_blocks, _position_blocks_scalar

_POS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("salt", pa.int32()),
        ("doc_id", pa.int32()),
        ("flags", pa.int32()),
        ("positions", pa.list_(pa.int32())),
    ]
)


def _mk_pos_batches(rows, batch_sizes):
    out, i = [], 0
    sizes = list(batch_sizes)
    while i < len(rows):
        s = sizes.pop(0) if sizes else len(rows) - i
        chunk = rows[i : i + s]
        i += s
        out.append(
            pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in chunk], pa.string()),
                    pa.array([r[1] for r in chunk], pa.int32()),
                    pa.array([r[2] for r in chunk], pa.int32()),
                    pa.array([r[3] for r in chunk], pa.int32()),
                    pa.array([r[4] for r in chunk], pa.int32()),
                    pa.array([r[5] for r in chunk], pa.list_(pa.int32())),
                ],
                schema=_POS_SCHEMA,
            )
        )
    return out


def _run_pos(worker, batches):
    cols = {n: [] for n in ["term", "shard", "salt", "doc_count", "first_doc_id",
                            "last_doc_id", "doc_ids_enc", "flags_enc",
                            "pos_counts_enc", "positions_enc"]}
    for rb in worker(iter(batches)):
        for n in cols:
            cols[n].extend(rb.column(n).to_pylist())
    return cols


def _assert_same_pos(batches_a, batches_b):
    a = _run_pos(_position_blocks_scalar, batches_a)
    b = _run_pos(_position_blocks, batches_b)
    for col in a:
        assert a[col] == b[col], (col, a[col][:4], b[col][:4])


def _random_pos_rows(rng, n_terms, max_docs, max_positions=12):
    rows = []
    for t in range(n_terms):
        term = f"t{t:03d}"
        for shard in (0, 1):
            for salt in (0, 1):
                if rng.random() < 0.3:
                    continue
                ndocs = rng.randint(1, max_docs)
                docs = rng.sample(range(0, 30000), ndocs)
                rng.shuffle(docs)
                for d in docs:
                    npos = rng.randint(0, max_positions)
                    pos = sorted(rng.sample(range(0, 65000), npos))
                    rows.append((term, shard, salt, d, rng.randint(0, 31), pos))
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pos_vec_equals_scalar_random(seed):
    rng = random.Random(100 + seed)
    rows = _random_pos_rows(rng, n_terms=25, max_docs=30)
    sizes = []
    left = len(rows)
    while left > 0:
        s = rng.choice([1, 2, 5, 40, 300])
        sizes.append(min(s, left))
        left -= sizes[-1]
    _assert_same_pos(_mk_pos_batches(rows, sizes), _mk_pos_batches(rows, sizes))
    # and with completely different batching on the vectorized side
    _assert_same_pos(
        _mk_pos_batches(rows, [len(rows)]), _mk_pos_batches(rows, [3] * (len(rows) // 3))
    )


def test_pos_vec_batch_spanning_group_and_empty():
    rng = random.Random(9)
    docs = rng.sample(range(0, 5000), 700)
    rows = [("big", 0, 0, d, 3, sorted(rng.sample(range(0, 999), 4))) for d in docs]
    rows += [("tail", 1, 1, 9, 1, [5])]
    _assert_same_pos(_mk_pos_batches(rows, [13] * 60), _mk_pos_batches(rows, [13] * 60))
    empty = _mk_pos_batches([], [])
    assert _run_pos(_position_blocks, iter([]))["term"] == []
