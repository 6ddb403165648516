"""Spark query engine: BM25 top-k over the parquet/Iceberg index tables.

Spark-first mapping of the reference query path
(/root/reference/query/src/QueryManager.cpp + QueryCoordinator.cpp):
partitions are shards; the per-shard single-threaded ISR walk + ranking run
inside ``applyInPandas`` using the exact same core as the oracle
(query/shard.py), and the cross-shard merge is the driver-side
sorted-lists merge (the reference coordinator's k-way head merge — which is
also precisely what Spark's TakeOrderedAndProject would compute).

Plan shape per query (designed so 100 TB of postings never move):
1. driver: parse query -> the handful of needed terms (ISR terms, raw
   quote/phrase terms, ranking tokens + their %desc variants);
2. pruned scans: postings/positions filtered by ``bucket`` partition and
   ``term`` predicate (partition pruning + parquet min/max skipping — the
   Spark analog of the reference's dictionary seek, TermDictionary.cpp);
3. df lookups for ranking tokens from term_dict collected to the driver
   (tiny) and closed over — the analog of the mmap'd dictionary probe;
4. one shuffle groups the query's blocks by shard, cogrouped with the
   cached doc_map (the reference keeps the doc map RAM-resident per shard;
   ``doc_map.cache()`` is the executor-memory analog);
5. per-shard top-50s (few rows) come back to the driver for the merge.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from .query import grammar as g
from .query.isr import DocMeta, ShardIndex
from .query.shard import evaluate_query, handle_ranking, top_k_from_sorted_lists
from .ranking import tokenify_query

RESULT_SCHEMA = "shard int, doc_id long, score long, url binary, title_packed binary"

_PAYLOAD_SCHEMA_COLS = [
    "kind", "term", "shard", "salt", "block_id", "doc_count",
    "doc_ids_enc", "freqs_enc", "flags_enc", "pos_counts_enc", "positions_enc",
]


def plan_terms(query: str) -> tuple[set[str], set[str], list]:
    """(posting terms, position terms, ranking tokens) needed by a query."""
    try:
        tree = g.parse_query(query)
    except g.ParseException:
        tree = None
    posting_terms: set[str] = set()
    position_terms: set[str] = set()
    if tree is not None:
        norm_terms, raw_terms = g.query_leaf_terms(tree)
        posting_terms |= norm_terms
        posting_terms |= raw_terms
        position_terms |= raw_terms  # quote/phrase adjacency checks
    tokens, _, _ = tokenify_query(query)
    for term, _m in tokens:
        position_terms.add(term)          # body positions for ranking
        position_terms.add("%" + term)    # description presence
    return posting_terms, position_terms, tokens


class SearchEngine:
    def __init__(self, spark, index_dir: str, cache_doc_map: bool = True):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "index_meta.json")) as f:
            self.meta = json.load(f)
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.positions = spark.read.parquet(os.path.join(index_dir, "positions"))
        self.term_dict = spark.read.parquet(os.path.join(index_dir, "term_dict"))
        self.doc_map = spark.read.parquet(os.path.join(index_dir, "doc_map"))
        if cache_doc_map:
            self.doc_map = self.doc_map.cache()
        self.stats = {
            int(r["shard"]): {
                "doc_count": int(r["doc_count"]),
                "total_body": int(r["total_body"]),
                "total_title": int(r["total_title"]),
                "total_url": int(r["total_url"]),
                "total_desc": int(r["total_desc"]),
            }
            for r in spark.read.parquet(os.path.join(index_dir, "index_stats")).collect()
        }

    # --- helpers ---

    def _bucket_filter(self, df, terms: set[str]):
        from pyspark.sql import functions as F

        from .indexer import term_bucket

        if not terms:
            return df.filter(F.lit(False))
        buckets = sorted({term_bucket(t, self.meta["num_buckets"]) for t in terms})
        return df.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(sorted(terms))
        )

    def _df_lookup(self, tokens) -> dict[tuple[str, int], int]:
        """Ranking-token document frequencies per shard from term_dict."""
        terms = {t for t, _ in tokens}
        if not terms:
            return {}
        rows = self._bucket_filter(self.term_dict, terms).collect()
        return {(r["term"], int(r["shard"])): int(r["df"]) for r in rows}

    # --- query API ---

    def top_k(self, query: str) -> list[tuple[int, int, bytes, list[bytes]]]:
        """Merged top-50 of (global_doc_id, score, url, title_words)."""
        from pyspark.sql import functions as F

        posting_terms, position_terms, tokens = plan_terms(query)

        p = self._bucket_filter(self.postings, posting_terms).select(
            F.lit("P").alias("kind"), "term", "shard", "salt", "block_id",
            "doc_count", "doc_ids_enc", "freqs_enc",
            F.lit(None).cast("binary").alias("flags_enc"),
            F.lit(None).cast("binary").alias("pos_counts_enc"),
            F.lit(None).cast("binary").alias("positions_enc"),
        )
        x = self._bucket_filter(self.positions, position_terms).select(
            F.lit("X").alias("kind"), "term", "shard", "salt",
            F.lit(0).alias("block_id"), "doc_count", "doc_ids_enc",
            F.lit(None).cast("binary").alias("freqs_enc"),
            "flags_enc", "pos_counts_enc", "positions_enc",
        )
        payload = p.unionByName(x)

        df_map = self._df_lookup(tokens)
        stats = self.stats
        shard_size = self.meta["shard_size"]
        qstr = query

        def run_shard(key, payload_pdf: pd.DataFrame, docmap_pdf: pd.DataFrame):
            shard_id = int(key[0])
            st = stats.get(shard_id)
            if st is None or len(docmap_pdf) == 0:
                return pd.DataFrame(
                    columns=["shard", "doc_id", "score", "url", "title_packed"]
                )
            shard = _build_shard(
                shard_id, shard_size, st, payload_pdf, docmap_pdf, df_map
            )
            matches = evaluate_query(qstr, shard)
            ranked = handle_ranking(qstr, shard, matches)
            from .codec import pack_words

            return pd.DataFrame(
                {
                    "shard": shard_id,
                    "doc_id": [d + shard.base_doc_id for d, _, _, _ in ranked],
                    "score": [s for _, s, _, _ in ranked],
                    "url": [u for _, _, u, _ in ranked],
                    "title_packed": [pack_words(t) for _, _, _, t in ranked],
                }
            )

        grouped = (
            payload.groupBy("shard")
            .cogroup(self.doc_map.groupBy("shard"))
            .applyInPandas(run_shard, schema=RESULT_SCHEMA)
        )
        from .codec import unpack_words

        rows = grouped.collect()
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(int(r["shard"]), []).append(
                (int(r["doc_id"]), int(r["score"]), bytes(r["url"]),
                 unpack_words(bytes(r["title_packed"])))
            )
        # rows arrive per shard already in (score desc, doc desc) order, but
        # collect() may interleave shards — regroup, keep within-shard order.
        ordered_lists = [by_shard[s] for s in sorted(by_shard)]
        if not ordered_lists:
            return []
        return top_k_from_sorted_lists(ordered_lists)

    def matches(self, query: str) -> list[int]:
        """Global ascending matched docids (diagnostic / tests)."""
        out: list[int] = []
        for tk in self._all_shards_eval(query):
            out.extend(tk)
        return sorted(out)

    def _all_shards_eval(self, query: str):
        from pyspark.sql import functions as F

        posting_terms, position_terms, _ = plan_terms(query)
        p = self._bucket_filter(self.postings, posting_terms).select(
            F.lit("P").alias("kind"), "term", "shard", "salt", "block_id",
            "doc_count", "doc_ids_enc", "freqs_enc",
            F.lit(None).cast("binary").alias("flags_enc"),
            F.lit(None).cast("binary").alias("pos_counts_enc"),
            F.lit(None).cast("binary").alias("positions_enc"),
        )
        x = self._bucket_filter(self.positions, position_terms).select(
            F.lit("X").alias("kind"), "term", "shard", "salt",
            F.lit(0).alias("block_id"), "doc_count", "doc_ids_enc",
            F.lit(None).cast("binary").alias("freqs_enc"),
            "flags_enc", "pos_counts_enc", "positions_enc",
        )
        payload = p.unionByName(x)
        stats = self.stats
        shard_size = self.meta["shard_size"]
        qstr = query

        def run_shard(key, payload_pdf, docmap_pdf):
            shard_id = int(key[0])
            st = stats.get(shard_id)
            if st is None or len(docmap_pdf) == 0:
                return pd.DataFrame(columns=["doc_id"])
            shard = _build_shard(shard_id, shard_size, st, payload_pdf, docmap_pdf, {})
            matches = evaluate_query(qstr, shard)
            return pd.DataFrame({"doc_id": [m + shard.base_doc_id for m in matches]})

        rows = (
            payload.groupBy("shard")
            .cogroup(self.doc_map.groupBy("shard"))
            .applyInPandas(run_shard, schema="doc_id long")
            .collect()
        )
        yield [int(r["doc_id"]) for r in rows]


def _build_shard(
    shard_id: int,
    shard_size: int,
    st: dict,
    payload_pdf: pd.DataFrame,
    docmap_pdf: pd.DataFrame,
    df_map: dict[tuple[str, int], int],
) -> ShardIndex:
    """Decode the query's blocks + the shard doc map into a ShardIndex."""
    from .codec import decode_position_block, decode_posting_block

    shard = ShardIndex(
        doc_count=st["doc_count"],
        base_doc_id=shard_id * shard_size,
        total_body_length=st["total_body"],
        total_title_length=st["total_title"],
        total_url_length=st["total_url"],
        total_desc_length=st["total_desc"],
    )
    for (term, shard_key), df in df_map.items():
        if shard_key == shard_id:
            shard.extra_doc_freqs[term] = df

    if len(payload_pdf):
        post = payload_pdf[payload_pdf["kind"] == "P"]
        if len(post):
            post = post.sort_values(["term", "salt", "block_id"], kind="mergesort")
            for term, grp in post.groupby("term", sort=False):
                docs: list[int] = []
                freqs: list[int] = []
                for de, fe in zip(grp["doc_ids_enc"], grp["freqs_enc"]):
                    d, f = decode_posting_block(bytes(de), bytes(fe))
                    docs.extend(d.tolist())
                    freqs.extend(f.tolist())
                shard.postings[term] = (docs, freqs)
        pos = payload_pdf[payload_pdf["kind"] == "X"]
        if len(pos):
            pos = pos.sort_values(["term", "salt"], kind="mergesort")
            for term, grp in pos.groupby("term", sort=False):
                docs = []
                flags: list[int] = []
                plists: list[list[int]] = []
                for de, fe, ce, pe in zip(
                    grp["doc_ids_enc"], grp["flags_enc"],
                    grp["pos_counts_enc"], grp["positions_enc"],
                ):
                    d, fl, pl = decode_position_block(
                        bytes(de), bytes(fe), bytes(ce), bytes(pe)
                    )
                    docs.extend(d.tolist())
                    flags.extend(fl.tolist())
                    plists.extend(p.tolist() for p in pl)
                shard.positions[term] = (docs, flags, plists)

    base = shard.base_doc_id
    for row in docmap_pdf.itertuples(index=False):
        local = int(row.doc_id) - base
        shard.doc_map[local] = DocMeta(
            doc_id=local,
            url=bytes(row.url),
            title=[bytes(t) for t in row.title],
            body_len=int(row.body_len),
            title_len=int(row.title_len),
            url_len=int(row.url_len),
            desc_len=int(row.desc_len),
            pagerank=float(row.pagerank),
        )
    return shard
