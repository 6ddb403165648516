"""Scale-shape fixtures for the dedup suite (VERDICT r01 #4/#7 done-criteria).

These plant adversarial distributions the sf-testdata gate never hits:
a corpus 10x the bench's doc count for SimHash candidate growth, and a
hot boilerplate shingle above the Jaccard df cap.
"""

import random

import pytest
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_simhash_candidates_subquadratic(spark, tmp_path):
    """1,500 diverse docs: banded candidate generation must stay near-linear
    (expected ~n * bands/buckets), nowhere near the n^2/2 ~ 1.1M pairs a
    narrow band space would produce (the r01 7-bit scheme gave O(n^2/128))."""
    from mithril_spark.relational import _simhash_candidates, _simhash_sketches

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(6000)]
    n = 1500
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(80)), "en", "web", 480)
        for i in range(n)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    cand = _simhash_candidates(_simhash_sketches(spark, sf)).count()
    # expectation: sum over bands of C(n,2)/|band space|
    #   = n^2/2 * (4/2^15 + 5/2^12) ~ 1.5k; allow generous slack for
    #   vote-bias correlation between random texts
    assert cand < 40 * n, cand
    assert cand < (n * (n - 1) // 2) * 0.05, cand


def test_jaccard_hot_shingle_cap(spark, tmp_path):
    """1,200 docs share one boilerplate phrase (its shingles' df > the 1000
    cap): pairs related ONLY through boilerplate must not be candidates,
    while a genuine near-dup pair (with its own rare shingles) is still
    found with EXACT inter/uni counts."""
    from mithril_spark.relational import (
        JACCARD_SHINGLE_DF_CAP,
        q_dedup_jaccard,
    )

    assert JACCARD_SHINGLE_DF_CAP == 1000
    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(20000)]
    boiler = "all rights reserved terms of service apply here"
    rows = []
    for i in range(1200):
        filler = " ".join(rng.choice(vocab) for _ in range(12))
        rows.append((i, f"{boiler} {filler}", "en", "web", 120))
    # a genuine near-dup pair built from rare tokens (jaccard > 0.8)
    body = " ".join(rng.choice(vocab) for _ in range(40))
    rows.append((5001, body + " endone", "en", "web", 300))
    rows.append((5002, body + " endtwo", "en", "web", 300))
    sf = _write_docs(spark, tmp_path, rows)

    got = q_dedup_jaccard(spark, sf).collect()
    pairs = {(r["doc_a"], r["doc_b"]): (r["inter"], r["uni"]) for r in got}
    assert (5001, 5002) in pairs
    inter, uni = pairs[(5001, 5002)]
    # shingle sets: 39 shared 3-grams + 1 unique tail 3-gram... the exact
    # counts come from distinct 3-grams of the 41-token texts
    assert uni - inter == 2 and inter * 10 >= uni * 8
    # boilerplate-only relations are capped out of candidate generation
    assert all(a >= 5001 for a, _b in pairs), sorted(pairs)[:5]
