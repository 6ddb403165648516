"""Training-data-pipeline operators beyond the reference's own surface.

Multimodal columns (image/audio/video as opaque binaries with typed
metadata), embedding utilities, and document fingerprinting. The decode
steps are STUBBED behind ``MULTIMODAL_DECODERS`` (no image/audio libs in
this container — see module docstrings); the Spark-side plumbing — schemas,
Arrow batch shape, partitioning — is real and tested.

Everything heavy is Arrow-batched (`mapInPandas`/`pandas_udf`); nothing is
per-row Python UDF.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feature array<float>, decode_ok boolean"
)


def synthetic_media_df(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads + typed metadata)."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = ("image", "audio", "video")[i % 3]
        payload = (h * ((i % 7) + 1))[: 32 + (i % 97)]
        rows.append((
            i, kind, payload,
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            64 + i % 512 if kind != "audio" else None,
            64 + (i * 3) % 512 if kind != "audio" else None,
            (i * 37) % 60000 if kind != "image" else None,
            16000 if kind == "audio" else None,
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(kind: str, payload: bytes) -> np.ndarray:
    """Deterministic stand-in for image/audio/video decoding.

    Real deployments plug Pillow / torchaudio / pyav here; this container has
    none of them, so the decode produces a deterministic 8-dim feature from
    the payload bytes (keeps the full pipeline testable end-to-end).
    """
    digest = hashlib.sha256(kind.encode() + b"\x00" + payload).digest()
    return np.frombuffer(digest[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1) / 255.0


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract media payloads, Arrow-batched.

    The batch shape is production-real: one ``mapInPandas`` pass, one output
    row per media row, feature as ``array<float>``. Swap ``_fake_decode``
    for a real decoder to productionize.
    """

    def run(batches):
        for pdf in batches:
            feats, shas, oks, nbytes = [], [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                nbytes.append(len(payload))
                shas.append(hashlib.sha256(payload).hexdigest())
                try:
                    feats.append([float(x) for x in _fake_decode(kind, payload)])
                    oks.append(True)
                except Exception:
                    feats.append([])
                    oks.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "sha256": shas,
                "feature": feats,
                "decode_ok": oks,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled timestamp.

    The actual frame decode is the stubbed step; the explode/planning is the
    real Spark work (duration -> sequence of sample points, JVM-side)."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "sample_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "sample_ms", "mime")
    )


# --- document fingerprinting (winnowing-style rolling hash) ---

def fingerprint_documents(
    docs: DataFrame, text_col: str = "text", k: int = 5, window: int = 4
) -> DataFrame:
    """Winnowing fingerprints: k-gram rolling hashes, per-window minima.

    Vectorized per batch with numpy (hashes via blake2b of token k-grams);
    output is the distinct fingerprint set per doc — the standard
    plagiarism/near-dup sketch (Schleimer et al., SIGMOD'03 style).
    """

    def run(batches):
        for pdf in batches:
            doc_ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = (text or "").lower().split()
                if len(toks) < k:
                    doc_ids.append(doc_id)
                    fps.append([])
                    continue
                grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
                hashes = np.fromiter(
                    (
                        struct.unpack(
                            "<Q", hashlib.blake2b(g.encode(), digest_size=8).digest()
                        )[0] >> 1
                        for g in grams
                    ),
                    dtype=np.int64,
                    count=len(grams),
                )
                if len(hashes) <= window:
                    sel = {int(hashes.min())}
                else:
                    idx = np.arange(len(hashes) - window + 1)
                    windows = np.lib.stride_tricks.sliding_window_view(hashes, window)
                    sel = set(int(x) for x in windows.min(axis=1))
                doc_ids.append(doc_id)
                fps.append(sorted(sel))
            yield pd.DataFrame({"doc_id": doc_ids, "fingerprints": fps})

    return docs.mapInPandas(run, schema="doc_id long, fingerprints array<long>")


def fingerprint_near_dups(docs: DataFrame, min_shared: int = 3) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints (blocked join)."""
    fp = fingerprint_documents(docs).select(
        "doc_id", F.explode("fingerprints").alias("fp")
    )
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


# --- embedding utilities (brute force + LSH bucketing for scale) ---

def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Brute-force cosine top-k against one query vector (JVM-side math)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum())) or 1.0
    q_lit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), q_lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        embeddings.withColumn("cosine", dot / (norm * F.lit(qn)))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "cosine")
    )


def lsh_bucket_embeddings(
    embeddings: DataFrame, n_planes: int = 16, seed: int = 42, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH signatures (the scale path for ANN).

    Planes are deterministic (seeded); the signature is computed in one
    Arrow-batched pass with a single matmul per batch. Candidate search =
    equality join on ``bucket`` (probing neighbors by flipping bits).
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def run(batches):
        for pdf in batches:
            mat = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            bits = (mat @ planes) > 0
            sig = np.zeros(len(pdf), dtype=np.int64)
            for j in range(n_planes):
                sig |= bits[:, j].astype(np.int64) << j
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "bucket": sig,
            })

    return embeddings.mapInPandas(run, schema="vec_id long, label int, bucket long")
