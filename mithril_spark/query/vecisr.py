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
    """True when the tree contains quote/phrase nodes (scalar-only quirks)."""
    if isinstance(node, (g.QuoteNode, g.PhraseNode)):
        return True
    if isinstance(node, (g.AndNode, g.OrNode)):
        return tree_has_positional(node.left) or tree_has_positional(node.right)
    if isinstance(node, g.NotNode):
        return tree_has_positional(node.expr)
    return False


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

    A NotNode is safe under _NONE/_FWD, never under _ARB. Property-tested
    against the scalar walk on randomized trees (tests/test_vec_match.py).
    """
    if isinstance(node, g.TermNode):
        return True
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
    return False  # quote/phrase (positional) — scalar only


def vec_eligible(node: g.Node) -> bool:
    """True when match_docs is exactly equivalent to the scalar ISR walk."""
    return not tree_has_positional(node) and _seek_safe(node, _NONE)


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
    like generate_isr (query/shard.py). Trees with quote/phrase nodes must
    not be passed here (tree_has_positional gates them to the scalar walk)."""
    if isinstance(node, g.TermNode):
        return _term_docs(
            shard, node.value, field_of_token.get(node.token_type, ALL)
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
        return complement_sorted(child, shard.doc_count)
    raise ValueError(f"unknown node {node!r}")
