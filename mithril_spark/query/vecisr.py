"""Vectorized match enumeration: numpy sorted-set twin of the ISR walk.

The reference enumerates matches with per-doc cursor stepping in C++
(/root/reference/query/src/QueryManager.cpp:34 budgets 250 ms/shard for it,
and query/src/intersect.cpp:1-259 catalogs the zipper/galloping
intersection kernels it builds on). A per-doc walk in *Python* cannot meet
that budget at scale — a head term at 100x enumerates millions of docids
per shard through interpreter dispatch. This module evaluates the same
query tree with whole-array numpy set algebra instead:

* ``TermReaderISR``'s posting list        -> a sorted int64 docid array;
* ``TermANDISR`` zig-zag intersection     -> ``searchsorted`` membership of
  the smaller list in the larger (the galloping variant of intersect.cpp);
* ``TermORISR`` min-of-heads union        -> sorted-unique merge;
* ``NotISR`` complement over [0, doc_count) with the reference's doc-0
  quirk (doc 0 only when the child stream is completely empty,
  NotIndexStreamReader.h:9-83);
* ``IdentityISR`` neutral elements        -> ``None`` propagated exactly as
  ``generate_isr``'s identity rewrite (Query.h:151-168,197-214).

Semantics note: all ISR trees built by ``generate_isr`` are *binary*
(grammar AndNode/OrNode are binary), and in a binary tree the zig-zag's
seek targets are non-decreasing per reader, so no ISR is ever sought
backwards — the cursor walk is therefore exactly sorted-set algebra, and
this module is bit-for-bit interchangeable with it. Quote/phrase nodes are
NOT set-expressible (one-behind buffering, destructive seeks, abort-to-
empty quirks — isr.py docstring); trees containing them take the scalar
path. The scalar walk stays as the property-test oracle
(tests/test_vec_match.py compares the two on randomized trees and corpora).
"""

from __future__ import annotations

import numpy as np

from ..text.normalize import ALL, STOPWORDS, normalize
from . import grammar as g

_EMPTY = np.empty(0, dtype=np.int64)


def intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two sorted-unique int64 arrays (galloping variant:
    binary-search the smaller list into the larger, intersect.cpp:118-178)."""
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0 or len(b) == 0:
        return _EMPTY
    idx = np.searchsorted(b, a)
    idxc = np.minimum(idx, len(b) - 1)
    return a[(idx < len(b)) & (b[idxc] == a)]


def union_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two sorted-unique int64 arrays (zipper merge)."""
    if len(a) == 0:
        return b
    if len(b) == 0:
        return a
    return np.union1d(a, b)


def complement_sorted(child: np.ndarray | None, doc_count: int) -> np.ndarray:
    """NotISR semantics (NotIndexStreamReader.h:9-83): when the child stream
    is completely empty the complement is [0, doc_count); otherwise doc 0 is
    never yielded and the result is [1, doc_count) minus the child set."""
    if doc_count <= 0:
        return _EMPTY
    if child is None or len(child) == 0:
        return np.arange(0, doc_count, dtype=np.int64)
    mask = np.ones(doc_count - 1, dtype=bool)
    sel = child[(child >= 1) & (child < doc_count)]
    mask[sel - 1] = False
    return np.flatnonzero(mask).astype(np.int64) + 1


def tree_has_positional(node: g.Node) -> bool:
    """True when the tree contains quote/phrase nodes."""
    if isinstance(node, (g.QuoteNode, g.PhraseNode)):
        return True
    if isinstance(node, (g.AndNode, g.OrNode)):
        return tree_has_positional(node.left) or tree_has_positional(node.right)
    if isinstance(node, g.NotNode):
        return tree_has_positional(node.expr)
    return False


class VecFallback(Exception):
    """Raised when the vectorized walk meets a state it does not model
    exactly (the phantom-match corner of an exhausted quote stream);
    evaluate_query falls back to the scalar walk for the whole tree."""


def _isin_sorted(values: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Membership of each value in the sorted int64 array ``table``."""
    if len(table) == 0:
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(table, values)
    idxc = np.minimum(idx, len(table) - 1)
    return (idx < len(table)) & (table[idxc] == values)


_POS_SHIFT = 32  # key = (doc << 32) | position; positions are < 2**32


def _flat_pos_keys(shard, term: str, cand: np.ndarray):
    """``term``'s stored positions over the candidate docs, flattened.

    Returns (keys, owner_docs): ``keys`` sorted ascending (candidates are
    ascending, positions ascending within a doc), one entry per position;
    ``owner_docs`` aligned. Candidates without stored positions contribute
    nothing — exactly ``get_positions`` returning [] in the scalar check."""
    docs_np, starts, flat = shard.positions_np(term)
    if len(docs_np) == 0 or len(cand) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    idx = np.searchsorted(docs_np, cand)
    idxc = np.minimum(idx, len(docs_np) - 1)
    present = (idx < len(docs_np)) & (docs_np[idxc] == cand)
    seg = idxc[present]
    owners = cand[present]
    lens = starts[seg + 1] - starts[seg]
    total = int(lens.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    cum_before = np.cumsum(lens) - lens
    take = (
        np.repeat(starts[seg] - cum_before, lens)
        + np.arange(total, dtype=np.int64)
    )
    pos = flat[take]
    owner_docs = np.repeat(owners, lens)
    return (owner_docs << _POS_SHIFT) | pos, owner_docs


def _quote_match_docs(shard, terms: list[str], cand: np.ndarray) -> np.ndarray:
    """Docs in ``cand`` where TermQuote's adjacency check holds: some base
    position x of word 0 has word i at x+i for all i (TermQuote.cpp:57-78,
    transcribed scalar in isr.TermQuoteISR._positions_match)."""
    base_keys, base_docs = _flat_pos_keys(shard, terms[0], cand)
    if len(base_keys) == 0:
        return _EMPTY
    alive = np.ones(len(base_keys), dtype=bool)
    for i, t in enumerate(terms[1:], 1):
        keys_i, _ = _flat_pos_keys(shard, t, cand)
        alive &= _isin_sorted(base_keys + i, keys_i)
        if not alive.any():
            return _EMPTY
    return np.unique(base_docs[alive])


def _phrase_match_docs(shard, terms: list[str], cand: np.ndarray) -> np.ndarray:
    """Docs in ``cand`` where TermPhrase's greedy span<=5 chain holds: from
    base x, each word i takes its first position >= the previous word's,
    all within x+5 (TermPhrase.cpp:60-88, scalar twin
    isr.TermPhraseISR._positions_match)."""
    from .isr import MAX_SPAN_SIZE

    base_keys, base_docs = _flat_pos_keys(shard, terms[0], cand)
    if len(base_keys) == 0:
        return _EMPTY
    base_pos = base_keys & ((1 << _POS_SHIFT) - 1)
    last = base_pos.copy()
    alive = np.ones(len(base_keys), dtype=bool)
    for t in terms[1:]:
        keys_i, _ = _flat_pos_keys(shard, t, cand)
        cur = (base_docs << _POS_SHIFT) | last
        j = np.searchsorted(keys_i, cur)  # bisect_left(positions, last_pos)
        ok = j < len(keys_i)
        jc = np.minimum(j, max(len(keys_i) - 1, 0))
        vals = keys_i[jc] if len(keys_i) else np.zeros(len(jc), dtype=np.int64)
        pos_j = vals & ((1 << _POS_SHIFT) - 1)
        ok &= (vals >> _POS_SHIFT) == base_docs  # stayed inside the doc
        ok &= (pos_j - base_pos) <= MAX_SPAN_SIZE
        alive &= ok
        if not alive.any():
            return _EMPTY
        last = np.where(ok, pos_j, last)
    return np.unique(base_docs[alive])


def quote_phrase_docs(shard, terms: list[str], phrase: bool) -> np.ndarray:
    """Emitted doc stream of TermQuoteISR/TermPhraseISR as a sorted array,
    replaying every quirk of the scalar cursor machine (isr.py:532-616):

    * the inner TermAND is pumped with move_next *before* each position
      check, so the FIRST candidate is never checked (candidates[1:]);
    * one-behind buffering drops the FINAL position match (a single match
      yields an empty stream);
    * the exhaustion pump runs the position check on the stepped-off AND
      state — raising IsrError (abort-to-empty for the whole query) exactly
      when the scalar walk would. That tail state is fully determined: the
      zig-zag invariant leaves every reader at the last candidate, so we
      reconstruct it with the real TermReaderISR/TermANDISR objects via one
      seek + one move_next and run the real _positions_match on it.
    """
    from .isr import TermANDISR, TermPhraseISR, TermQuoteISR, TermReaderISR

    if not terms:
        return _EMPTY
    cand = shard.posting_docs_np(terms[0])
    for t in terms[1:]:
        cand = intersect_sorted(cand, shard.posting_docs_np(t))
        if len(cand) == 0:
            break

    if len(cand) == 0:
        # the AND exhausts inside its constructor (seek-only zig-zag:
        # every reader ends cleanly at_end) — empty stream, no abort
        return _EMPTY

    checked = cand[1:]
    if len(checked):
        matcher = _phrase_match_docs if phrase else _quote_match_docs
        matched = matcher(shard, terms, checked)
    else:
        matched = _EMPTY

    # exhaustion pump replay (may raise IsrError = the reference abort)
    readers = [TermReaderISR(t, shard) for t in terms]
    stream = TermANDISR(list(readers))
    stream.seek_to_doc_id(int(cand[-1]))
    stream.move_next()
    if stream.has_next():  # cannot happen: cand[-1] is the last common doc
        raise VecFallback("post-final AND candidate")
    shim_cls = TermPhraseISR if phrase else TermQuoteISR
    shim = shim_cls.__new__(shim_cls)
    shim.term_readers = readers
    if shim._positions_match():
        # phantom match on an exhausted stream (readers stranded on
        # different docs whose positions happen to align) — the scalar
        # walk would emit DOCID_MAX; not modelled here, fall back
        raise VecFallback("phantom match at exhaustion")

    # one-behind: the last match is never exposed to the consumer
    return matched[:-1] if len(matched) else _EMPTY


# Seek-exposure modes for the safety analysis below.
_NONE, _FWD, _ARB = 0, 1, 2


def _seek_safe(node: g.Node, mode: int) -> bool:
    """Can this subtree's cursor walk be replaced by set algebra?

    The one stateful quirk that breaks set semantics is ``NotISR.seek``
    with a *backward* target (NotIndexStreamReader.h:66-74): it resets its
    own position but its child cursor is forward-only, so the re-derived
    complement can emit docs that ARE in the child set. Every other ISR is
    seek-idempotent (TermReader backward seeks are no-ops; AND/OR recompute
    from child positions). So the walk equals set algebra iff no NotISR can
    ever receive a backward seek. Seek exposure propagates top-down:

    * root and children of a never-seeked OR are never seeked (_NONE — the
      drive loop and OR.move_next only call move_next);
    * NotISR.move_next seeks its child with monotone forward targets
      (_FWD), and a forward-seeked NotISR re-derives correctly;
    * AND zig-zag seek targets are monotone per *candidate* but the very
      first seek can land BEHIND a NotISR child's initial position (a
      NotISR starts at its first result, >= 1, while the first candidate
      can be 0 or inside the complement's leading gap) — so any AND child
      subtree is _ARB;
    * OR.seek(t) forwards the SAME t to all children — backward relative
      to a child ahead of the min — so children of a seeked OR are _ARB.

    A NotNode is safe under _NONE/_FWD, never under _ARB. Quote/phrase
    streams are modelled by ``quote_phrase_docs`` only for pure move_next
    consumption — their ``seek_to_doc_id`` is *destructive* (consume until
    current == target, TermQuote.cpp:52-55, exhausting on an absent
    target), so they are safe only under _NONE. Property-tested against
    the scalar walk on randomized trees (tests/test_vec_match.py).
    """
    if isinstance(node, g.TermNode):
        return True
    if isinstance(node, (g.QuoteNode, g.PhraseNode)):
        return mode == _NONE
    if isinstance(node, g.NotNode):
        if mode == _ARB:
            return False
        return _seek_safe(node.expr, _FWD)
    if isinstance(node, g.AndNode):
        return _seek_safe(node.left, _ARB) and _seek_safe(node.right, _ARB)
    if isinstance(node, g.OrNode):
        child_mode = _NONE if mode == _NONE else _ARB
        return _seek_safe(node.left, child_mode) and _seek_safe(
            node.right, child_mode
        )
    return False


def vec_eligible(node: g.Node) -> bool:
    """True when match_docs is exactly equivalent to the scalar ISR walk."""
    return _seek_safe(node, _NONE)


def _term_docs(shard, value: str, field: int) -> np.ndarray | None:
    """TermReaderFactory::CreateISR (ISRFactory.cpp:19-30) as a doc set.

    Returns None for the identity stream (normalized-away / stopword)."""
    raw = value.encode("utf-8")
    normalized = normalize(raw, field)
    if not normalized or raw in STOPWORDS:
        return None
    term = normalized.decode("latin-1")
    if field == ALL:
        # GenericTermReader: OR over the 5 decorated variants
        out = _EMPTY
        for dec in ("", "#", "@", "$", "%"):
            out = union_sorted(out, shard.posting_docs_np(dec + term))
        return out
    return shard.posting_docs_np(term)


def match_docs(node: g.Node, shard, field_of_token: dict) -> np.ndarray | None:
    """Query-tree -> sorted docid array; None propagates identity exactly
    like generate_isr (query/shard.py). Quote/phrase nodes are evaluated by
    quote_phrase_docs (may raise IsrError = the reference's abort-to-empty,
    or VecFallback when the phantom-match corner requires the scalar walk);
    a quote node is never an identity — an empty quote stream still
    annihilates an enclosing AND, so it maps to an empty array, not None."""
    if isinstance(node, g.TermNode):
        return _term_docs(
            shard, node.value, field_of_token.get(node.token_type, ALL)
        )
    if isinstance(node, (g.QuoteNode, g.PhraseNode)):
        return quote_phrase_docs(
            shard,
            g.extract_quote_terms(node.value),
            phrase=isinstance(node, g.PhraseNode),
        )
    if isinstance(node, (g.AndNode, g.OrNode)):
        left = match_docs(node.left, shard, field_of_token)
        right = match_docs(node.right, shard, field_of_token)
        if left is None and right is None:
            return None
        if left is None:
            return right
        if right is None:
            return left
        if isinstance(node, g.AndNode):
            return intersect_sorted(left, right)
        return union_sorted(left, right)
    if isinstance(node, g.NotNode):
        child = match_docs(node.expr, shard, field_of_token)
        return complement_sorted(child, shard.docid_space or shard.doc_count)
    raise ValueError(f"unknown node {node!r}")
