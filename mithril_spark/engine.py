"""Spark query engine: BM25 top-k over the parquet/Iceberg index tables.

Spark-first mapping of the reference query path
(/root/reference/query/src/QueryManager.cpp + QueryCoordinator.cpp):
partitions are shards; the per-shard single-threaded ISR walk + ranking run
inside ``mapInPandas`` using the exact same core as the oracle
(query/shard.py), and the cross-shard merge is the driver-side
sorted-lists merge (the reference coordinator's k-way head merge — which is
also precisely what Spark's TakeOrderedAndProject computes).

Plan shape per query (designed so the bulk of the index never moves):
1. driver: parse the query -> the handful of needed terms (ISR terms, raw
   quote/phrase terms, ranking tokens + their %desc variants);
2. pruned scans: postings/positions filtered by ``bucket`` partition and
   ``term`` predicate (partition pruning + parquet min/max skipping — the
   Spark analog of the reference's dictionary seek) are *collected to the
   driver* — a few posting blocks per query term — and shipped to executors
   in the task closure (a broadcast of query-term slices, SURVEY.md §1.4);
3. the doc map is packed once into per-shard binary images cached in the
   block manager (the analog of the reference's mmap+mlock'd per-shard doc
   map, DocumentMapReader.cpp:15-100); each query is then ONE shuffle-free
   job over those cached rows;
4. per-shard top-50s (a few rows) come back for the coordinator merge.

Head-term caveat: a stop-word-scale term's blocks would be large to collect;
``max_payload_rows`` guards it — the expected payload size is estimated from
term_dict document frequencies (one tiny collect the query path needs anyway
for ranking df), and beyond the cap the engine switches to the cogroup path:
the pruned posting/position scans are grouped by shard and joined against
the cached shard images executor-side, so head-term blocks flow
executor-to-executor and never transit the driver (the Spark analog of the
reference's per-shard mmap reads, index/src/TermReader.cpp:20-214).
"""

from __future__ import annotations

import json
import os
import pickle

import pandas as pd

from .query import grammar as g
from .query.isr import DocMeta, ShardIndex
from .query.shard import evaluate_query, handle_ranking, top_k_from_sorted_lists
from .ranking import tokenify_query

RESULT_SCHEMA = "shard int, doc_id long, score long, url binary, title_packed binary"


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


def _pack_docmap(pdf: pd.DataFrame) -> pd.DataFrame:
    shard = int(pdf["shard"].iloc[0])
    entries = {}
    for row in pdf.itertuples(index=False):
        entries[int(row.doc_id)] = (
            bytes(row.url),
            [bytes(t) for t in row.title],
            int(row.body_len), int(row.title_len),
            int(row.url_len), int(row.desc_len), float(row.pagerank),
        )
    return pd.DataFrame(
        {"shard": [shard], "docmap": [pickle.dumps(entries, protocol=4)]}
    )


def _payload_from_pdf(pdf: pd.DataFrame) -> dict:
    """One shard's cogrouped union-block rows -> the payload dict shape."""
    payload: dict[str, list] = {"P": [], "X": []}
    for row in pdf.itertuples(index=False):
        if row.kind == "P":
            mt = row.max_tfn
            if mt is not None and mt != mt:  # NaN from the nullable union
                mt = None
            payload["P"].append(
                (row.term, int(row.salt), int(row.block_id),
                 int(row.doc_count), int(row.first_doc_id),
                 int(row.last_doc_id), int(row.max_freq),
                 None if mt is None else float(mt),
                 bytes(row.doc_ids_enc), bytes(row.freqs_enc))
            )
        else:
            payload["X"].append(
                (row.term, int(row.salt), bytes(row.doc_ids_enc),
                 bytes(row.flags_enc), bytes(row.pos_counts_enc),
                 bytes(row.positions_enc))
            )
    return payload


# Estimated posting entries above which query blocks stop being collected
# to the driver and flow executor-side instead (cogroup path). ~1M entries
# is a few thousand 128-doc blocks — tens of MB — comfortably collectable;
# a head term at web scale blows far past it.
DEFAULT_MAX_PAYLOAD_ROWS = 1_000_000


class SearchEngine:
    def __init__(self, spark, index_dir: str, cache_doc_map: bool = True,
                 max_payload_rows: int = DEFAULT_MAX_PAYLOAD_ROWS):
        self.spark = spark
        self.index_dir = index_dir
        self.max_payload_rows = max_payload_rows
        with open(os.path.join(index_dir, "index_meta.json")) as f:
            self.meta = json.load(f)
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.positions = spark.read.parquet(os.path.join(index_dir, "positions"))
        self.term_dict = spark.read.parquet(os.path.join(index_dir, "term_dict"))
        if cache_doc_map:
            # lazy block-manager caching: only bucket partitions a query
            # actually scans get cached — a hot-term cache, not a full load
            self.postings = self.postings.cache()
            self.positions = self.positions.cache()
            self.term_dict = self.term_dict.cache()
        doc_map = spark.read.parquet(os.path.join(index_dir, "doc_map"))
        self.shard_images = doc_map.groupBy("shard").applyInPandas(
            _pack_docmap, schema="shard int, docmap binary"
        )
        if cache_doc_map:
            self.shard_images = self.shard_images.persist()
            self.shard_images.count()  # materialize the shard images once
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

    def _term_dfs(self, terms: set[str]) -> dict[tuple[str, int], int]:
        """Per-shard document frequencies from term_dict (one small collect).

        Serves double duty: ranking-token df (GetDocumentFrequencies,
        Ranker.cpp:46-64) and the payload-size estimate that picks the
        driver-collect vs cogroup execution path."""
        if not terms:
            return {}
        rows = self._bucket_filter(self.term_dict, terms).collect()
        return {(r["term"], int(r["shard"])): int(r["df"]) for r in rows}

    def _collect_payload(self, posting_terms, position_terms):
        """Driver-side collect of the query's (small) posting/position blocks."""
        payload: dict[int, dict[str, list]] = {}
        from pyspark.sql import functions as F

        # max_tfn is absent from indexes built before the tight block-max
        # metadata existed; WAND then falls back to the loose max_freq bound.
        tfn_col = (
            F.col("max_tfn") if "max_tfn" in self.postings.columns
            else F.lit(None).cast("double").alias("max_tfn")
        )
        prows = self._bucket_filter(self.postings, posting_terms).select(
            "shard", "term", "salt", "block_id", "doc_count",
            "first_doc_id", "last_doc_id", "max_freq", tfn_col,
            "doc_ids_enc", "freqs_enc",
        ).collect()
        for r in prows:
            payload.setdefault(int(r["shard"]), {"P": [], "X": []})["P"].append(
                (r["term"], int(r["salt"]), int(r["block_id"]),
                 int(r["doc_count"]), int(r["first_doc_id"]),
                 int(r["last_doc_id"]), int(r["max_freq"]),
                 None if r["max_tfn"] is None else float(r["max_tfn"]),
                 bytes(r["doc_ids_enc"]), bytes(r["freqs_enc"]))
            )
        xrows = self._bucket_filter(self.positions, position_terms).select(
            "shard", "term", "salt", "doc_ids_enc", "flags_enc",
            "pos_counts_enc", "positions_enc",
        ).collect()
        for r in xrows:
            payload.setdefault(int(r["shard"]), {"P": [], "X": []})["X"].append(
                (r["term"], int(r["salt"]), bytes(r["doc_ids_enc"]),
                 bytes(r["flags_enc"]), bytes(r["pos_counts_enc"]),
                 bytes(r["positions_enc"]))
            )
        return payload

    def _blocks_df(self, posting_terms, position_terms):
        """Pruned posting+position block scans as ONE union DataFrame keyed
        by shard — the executor-side payload for the cogroup path."""
        from pyspark.sql import functions as F

        tfn_col = (
            F.col("max_tfn").cast("double")
            if "max_tfn" in self.postings.columns
            else F.lit(None).cast("double")
        ).alias("max_tfn")
        null = lambda t: F.lit(None).cast(t)
        p = self._bucket_filter(self.postings, posting_terms).select(
            "shard", F.lit("P").alias("kind"), "term", "salt",
            F.col("block_id").cast("long").alias("block_id"),
            F.col("doc_count").cast("long").alias("doc_count"),
            F.col("first_doc_id").cast("long").alias("first_doc_id"),
            F.col("last_doc_id").cast("long").alias("last_doc_id"),
            F.col("max_freq").cast("long").alias("max_freq"), tfn_col,
            "doc_ids_enc", "freqs_enc",
            null("binary").alias("flags_enc"),
            null("binary").alias("pos_counts_enc"),
            null("binary").alias("positions_enc"),
        )
        x = self._bucket_filter(self.positions, position_terms).select(
            "shard", F.lit("X").alias("kind"), "term", "salt",
            null("long").alias("block_id"), null("long").alias("doc_count"),
            null("long").alias("first_doc_id"), null("long").alias("last_doc_id"),
            null("long").alias("max_freq"), null("double").alias("max_tfn"),
            "doc_ids_enc", null("binary").alias("freqs_enc"),
            "flags_enc", "pos_counts_enc", "positions_enc",
        )
        return p.unionByName(x)

    def _execute(self, posting_terms, position_terms, shard_fn, schema,
                 dfs: dict[tuple[str, int], int] | None = None) -> list:
        """Run ``shard_fn(shard_id, payload, docmap_bytes) -> pd.DataFrame``
        once per shard and collect the (small) per-shard results.

        Path choice (the ``max_payload_rows`` guard): total df over the
        needed terms estimates the payload's posting entries. At or below
        the cap, blocks are collected to the driver and shipped in the task
        closure (one job, no extra shuffle). Above it, blocks never touch
        the driver: the pruned scans are cogrouped with the cached shard
        images by shard and decoded executor-side — the shuffle moves only
        the query's own blocks, and the image side's exchange is elided
        because shard_images is already hash-partitioned by shard."""
        col_names = [c.strip().split()[0] for c in schema.split(",")]

        def _empty():
            return pd.DataFrame({c: [] for c in col_names})

        need = set(posting_terms) | set(position_terms)
        if dfs is None:
            dfs = self._term_dfs(need)
        est = sum(df for (t, _s), df in dfs.items() if t in need)

        if est <= self.max_payload_rows:
            payload = self._collect_payload(posting_terms, position_terms)

            def run(batches):
                outs = []
                for pdf in batches:
                    for row in pdf.itertuples(index=False):
                        sid = int(row.shard)
                        outs.append(shard_fn(sid, payload.get(sid), row.docmap))
                yield pd.concat(outs, ignore_index=True) if outs else _empty()

            return self.shard_images.mapInPandas(run, schema).collect()

        blocks = self._blocks_df(posting_terms, position_terms)

        def run_co(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if not len(left):
                return _empty()
            payload = _payload_from_pdf(right)
            outs = [
                shard_fn(int(row.shard), payload, row.docmap)
                for row in left.itertuples(index=False)
            ]
            return pd.concat(outs, ignore_index=True) if outs else _empty()

        return (
            self.shard_images.groupBy("shard")
            .cogroup(blocks.groupBy("shard"))
            .applyInPandas(run_co, schema)
            .collect()
        )

    # --- query API ---

    def top_k(self, query: str) -> list[tuple[int, int, bytes, list[bytes]]]:
        """Merged top-50 of (global_doc_id, score, url, title_words)."""
        posting_terms, position_terms, tokens = plan_terms(query)
        token_terms = {t for t, _ in tokens}
        dfs = self._term_dfs(posting_terms | position_terms | token_terms)
        df_map = {k: v for k, v in dfs.items() if k[0] in token_terms}
        stats = self.stats
        shard_size = self.meta["shard_size"]
        qstr = query

        def shard_fn(shard_id, payload, docmap_bytes):
            from .codec import pack_words

            out = {"shard": [], "doc_id": [], "score": [],
                   "url": [], "title_packed": []}
            st = stats.get(shard_id)
            if st is not None:
                shard = _build_shard(
                    shard_id, shard_size, st,
                    payload, pickle.loads(docmap_bytes), df_map,
                )
                matches = evaluate_query(qstr, shard)
                for d, s, u, t in handle_ranking(qstr, shard, matches):
                    out["shard"].append(shard_id)
                    out["doc_id"].append(d + shard.base_doc_id)
                    out["score"].append(s)
                    out["url"].append(u)
                    out["title_packed"].append(pack_words(t))
            return pd.DataFrame(out)

        from .codec import unpack_words

        rows = self._execute(
            posting_terms, position_terms, shard_fn, RESULT_SCHEMA, dfs=dfs
        )
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(int(r["shard"]), []).append(
                (int(r["doc_id"]), int(r["score"]), bytes(r["url"]),
                 unpack_words(bytes(r["title_packed"])))
            )
        ordered_lists = [by_shard[s] for s in sorted(by_shard)]
        if not ordered_lists:
            return []
        return top_k_from_sorted_lists(ordered_lists)

    def bm25_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Block-max-WAND pure-BM25 disjunctive top-k (query/wand.py).

        Query terms are body-normalized; per-shard WAND runs inside the
        cached shard images (body lengths come from the doc-map image) with
        per-shard df/stats, exactly like per-shard exhaustive BM25; the
        driver merges by (score desc, global doc asc)."""
        from .text.normalize import BODY, normalize

        terms = {
            normalize(tok.encode("utf-8"), BODY).decode("latin-1")
            for tok in query.split()
        } - {""}
        if not terms:
            return []
        stats = self.stats
        shard_size = self.meta["shard_size"]

        def shard_fn(shard_id, pl, docmap_bytes):
            from .query.wand import bm25_wand_topk

            shards_out, docs_out, scores_out = [], [], []
            st = stats.get(shard_id)
            if st is not None and pl and pl["P"]:
                docmap = pickle.loads(docmap_bytes)
                base = shard_id * shard_size
                body_lens = {
                    doc_id - base: meta[2] for doc_id, meta in docmap.items()
                }
                term_blocks = _payload_blocks(pl["P"])
                avg = (
                    st["total_body"] / st["doc_count"]
                    if st["doc_count"] else 0.0
                )
                for d, s in bm25_wand_topk(
                    term_blocks, body_lens, st["doc_count"], avg, k
                ):
                    shards_out.append(shard_id)
                    docs_out.append(d + base)
                    scores_out.append(s)
            return pd.DataFrame(
                {"shard": shards_out, "doc_id": docs_out, "score": scores_out}
            )

        rows = self._execute(
            terms, set(), shard_fn, "shard int, doc_id long, score double"
        )
        merged = sorted(
            ((int(r["doc_id"]), float(r["score"])) for r in rows),
            key=lambda t: (-t[1], t[0]),
        )
        return merged[:k]

    def matches(self, query: str) -> list[int]:
        """Global ascending matched docids (diagnostic / tests)."""
        posting_terms, position_terms, _ = plan_terms(query)
        stats = self.stats
        shard_size = self.meta["shard_size"]
        qstr = query

        def shard_fn(shard_id, payload, docmap_bytes):
            out: list[int] = []
            st = stats.get(shard_id)
            if st is not None:
                shard = _build_shard(
                    shard_id, shard_size, st,
                    payload, pickle.loads(docmap_bytes), {},
                )
                out.extend(
                    m + shard.base_doc_id for m in evaluate_query(qstr, shard)
                )
            return pd.DataFrame({"doc_id": out})

        rows = self._execute(posting_terms, position_terms, shard_fn, "doc_id long")
        return sorted(int(r["doc_id"]) for r in rows)


def _payload_blocks(p_rows) -> dict[str, list[dict]]:
    """Payload posting tuples -> per-term block dicts for the WAND cursors."""
    out: dict[str, list[dict]] = {}
    for term, salt, block_id, dc, fd, ld, mf, mt, de, fe in p_rows:
        out.setdefault(term, []).append({
            "doc_count": dc, "first_doc_id": fd, "last_doc_id": ld,
            "max_freq": mf, "max_tfn": mt, "doc_ids_enc": de, "freqs_enc": fe,
            "_order": (salt, block_id),
        })
    for blocks in out.values():
        blocks.sort(key=lambda b: b["_order"])
    return out


def _build_shard(
    shard_id: int,
    shard_size: int,
    st: dict,
    payload: dict | None,
    docmap: dict,
    df_map: dict[tuple[str, int], int],
) -> ShardIndex:
    """Decode the query's blocks + the shard doc-map image into a ShardIndex."""
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

    if payload:
        by_term: dict[str, list] = {}
        for term, salt, block_id, _dc, _fd, _ld, _mf, _mt, de, fe in payload["P"]:
            by_term.setdefault(term, []).append((salt, block_id, de, fe))
        for term, blocks in by_term.items():
            blocks.sort(key=lambda b: (b[0], b[1]))
            docs: list[int] = []
            freqs: list[int] = []
            for _salt, _bid, de, fe in blocks:
                d, f = decode_posting_block(de, fe)
                docs.extend(d.tolist())
                freqs.extend(f.tolist())
            shard.postings[term] = (docs, freqs)
        by_term = {}
        for term, salt, de, fe, ce, pe in payload["X"]:
            by_term.setdefault(term, []).append((salt, de, fe, ce, pe))
        for term, blocks in by_term.items():
            blocks.sort(key=lambda b: b[0])
            docs = []
            flags: list[int] = []
            plists: list[list[int]] = []
            for _salt, de, fe, ce, pe in blocks:
                d, fl, pl = decode_position_block(de, fe, ce, pe)
                docs.extend(d.tolist())
                flags.extend(fl.tolist())
                plists.extend(p.tolist() for p in pl)
            shard.positions[term] = (docs, flags, plists)

    base = shard.base_doc_id
    for doc_id, (url, title, body_len, title_len, url_len, desc_len, pagerank) in docmap.items():
        local = doc_id - base
        shard.doc_map[local] = DocMeta(
            doc_id=local, url=url, title=title, body_len=body_len,
            title_len=title_len, url_len=url_len, desc_len=desc_len,
            pagerank=pagerank,
        )
    return shard
