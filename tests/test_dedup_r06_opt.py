"""Focused gates for the r06 dedup execution rewrites.

The r06 optimization round changed HOW three near-dup queries execute
(numpy bucket verification for embedding LSH, candidate-doc prefiltering
for the jaccard verify) without changing WHAT they compute. test_relational
gates the fixture SFs; these tests pin the branches the fixtures never
exercise: the int64 (non-BLAS) Gram fallback, ragged vector lengths, and
the prefilter on/off identity of _verify_jaccard.
"""

import numpy as np

from mithril_spark.relational import (
    _shingles,
    _verify_jaccard,
    q_dedup_embedding,
)

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _spark_pairs(spark, sf_dir):
    out = q_dedup_embedding(spark, sf_dir).collect()
    return sorted(tuple(r) for r in out)


def _w64(x: int) -> int:
    """Java-long (two's-complement int64) wraparound."""
    return ((x + (1 << 63)) % (1 << 64)) - (1 << 63)


def _q1000(x: float) -> int:
    """Spark F.round(double * 1000) — HALF_UP (away from zero)."""
    import math

    y = float(np.float32(x)) * 1000.0  # float32 storage, double math
    return math.floor(y + 0.5) if y >= 0 else -math.floor(-y + 0.5)


def _reference_pairs(rows):
    """Arbitrary-precision python-int reference of the SPARK semantics
    (cross-length pairs dropped — their zip_with dot is NULL), wrapping
    exactly where the JVM long expression would (the comparison
    100*dot*dot >= 16*na*nb, left-assoc per operation). Valid while the
    dot/norm accumulations themselves stay inside int64 — asserted by the
    fixture bound below."""
    qs = {vid: [_q1000(x) for x in vec] for vid, vec, _ in rows}
    bucket_members: dict = {}
    for vid, q in qs.items():
        bits = []
        for j in range(16):
            dot = sum(
                x * ((1103515245 * (i * 97 + j * 31 + 7)) % 65536 - 32768)
                for i, x in enumerate(q))
            bits.append(1 if dot >= 0 else 0)
        for b in range(4):
            bv = sum(bits[b * 4 + k] << k for k in range(4))
            bucket_members.setdefault((b, bv), []).append(vid)
    pairs = set()
    for members in bucket_members.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                qa, qb = qs[a], qs[b]
                if len(qa) != len(qb):
                    continue  # expression-form dot is NULL
                dot = sum(x * y for x, y in zip(qa, qb))
                na = sum(x * x for x in qa)
                nb = sum(x * x for x in qb)
                lhs = _w64(_w64(100 * dot) * dot)
                rhs = _w64(_w64(16 * na) * nb)
                if dot > 0 and lhs >= rhs:
                    pairs.add((a, b, dot, na, nb))
    return sorted(pairs)


def test_embedding_int64_fallback_matches_wrap_reference(spark, tmp_path):
    """Integer-valued vectors ~1.2e7 quantize to |q| ~ 1.2e10, putting
    dim * max|q|^2 past 2^53: the verify must take the exact int64 matmul
    branch (not float64 BLAS) and reproduce the JVM's wrapping-long
    comparison bit-for-bit. (DuckDB cannot oracle this regime — it RAISES
    on int64 overflow where the JVM silently wraps — so the gate is an
    independent arbitrary-precision python reference of the same
    semantics.)"""
    rng = np.random.default_rng(7)
    dim = 64
    # values ~2e4 quantize to |q| ~ 2e7: dim * (2e7)^2 = 2.6e16 > 2^53
    # (forces the int64 branch) while dots stay <= 2.6e16 << 2^63 (no
    # accumulation overflow); integers < 2^24 are exact in float32
    scale = 20_000
    rows = []
    vid = 0
    for c in range(3):  # three near-dup clusters
        base = rng.integers(-scale, scale, dim)
        for _ in range(8):
            v = base + rng.integers(-10, 10, dim)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    for _ in range(20):  # background vectors
        v = rng.integers(-scale, scale, dim)
        rows.append((vid, [float(x) for x in v], 99))
        vid += 1
    amax = max(abs(round(x) * 1000) for _, vec, _ in rows for x in vec)
    assert dim * amax * amax >= (1 << 53), "fixture no longer forces the fallback"
    # the reference's wrap model is per-comparison only: the dot/norm
    # accumulations themselves must stay inside int64
    assert dim * amax * amax < (1 << 62)
    sf = _write_embeddings(spark, tmp_path, rows)
    got = _spark_pairs(spark, sf)
    want = _reference_pairs(rows)
    assert len(got) > 0, "vacuous fixture: no near-dup pairs survived"
    assert got == want


def test_embedding_ragged_lengths_match_spark_semantics(spark, tmp_path):
    """Mixed vector dims: same-length pairs verify normally, cross-length
    pairs must be dropped (their expression-form dot is NULL) — and the
    numpy path must not crash on the ragged batch. Gated against the
    python reference of the SPARK expression semantics: DuckDB diverges
    on ragged input regardless of implementation (its list indexing past
    the shorter vector yields NULL elements that list_sum SKIPS, so the
    a-shorter-than-b direction gets a partial dot instead of NULL) —
    a pre-existing cross-engine difference outside the fixture domain
    (every real embeddings table is fixed-dim), unchanged by r06."""
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for dim in (8, 12):
        base = rng.uniform(-1.0, 1.0, dim)
        for _ in range(6):
            v = base + rng.uniform(-0.01, 0.01, dim)
            rows.append((vid, [float(x) for x in v], dim))
            vid += 1
    sf = _write_embeddings(spark, tmp_path, rows)
    got = _spark_pairs(spark, sf)
    want = _reference_pairs(rows)
    assert len(got) > 0, "vacuous fixture: no near-dup pairs survived"
    assert got == want
    dims = {r[0]: r[2] for r in rows}
    for vec_a, vec_b, *_ in got:
        assert dims[vec_a] == dims[vec_b], "cross-length pair leaked"


def test_verify_jaccard_prefilter_identity(spark):
    """prefilter=True (localCheckpoint + semi-join of the shingle table
    down to candidate docs) must be row-identical to prefilter=False."""
    sf = "/root/testdata/sf0.01"
    sh = _shingles(spark, sf)
    ids = [r["doc_id"] for r in
           sh.select("doc_id").distinct().orderBy("doc_id").limit(12).collect()]
    cand = spark.createDataFrame(
        [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]],
        "doc_a long, doc_b long",
    )
    # t_num=0 keeps every candidate pair in the output, so the identity
    # covers inter/uni values for pairs with zero overlap too
    plain = sorted(tuple(r) for r in _verify_jaccard(cand, sh, 0, 10).collect())
    pre = sorted(tuple(r) for r in
                 _verify_jaccard(cand, sh, 0, 10, prefilter=True).collect())
    assert len(plain) == len(ids) * (len(ids) - 1) // 2
    assert plain == pre
