"""Compound filter predicates — the reference's filter2 algebra.

Mirrors parquet-java's predicate tree (`parquet-column/.../filter2/predicate/
Operators.java:565` And, `:577` Or, `:589` Not, `:508` NotIn, plus
`UserDefinedPredicate`) as a small picklable expression algebra evaluated
three ways:

- ``mask(pred, table)``  — exact row-level evaluation via pyarrow.compute
  (SQL three-valued logic: Kleene and/or, nulls fail the filter);
- ``may_match(pred, leaf_fn)`` — sound pruning verdict over whatever
  metadata the call site has (row-group stats, page bounds, blooms,
  dictionary pages): ``leaf_fn(leaf) -> bool`` answers "can any row in this
  granule satisfy this LEAF"; the tree combines answers (And=all, Or=any);
- ``normalize(...)`` — accepts the legacy ``[(col, op, value), ...]``
  conjunction lists every rayenc surface used through round 3 and returns an
  NNF tree (Not pushed to the leaves, flipping operators the way
  `LogicalInverteRewriter` does in the reference), so pruning never has to
  reason about negation nodes.

Pruning soundness with nulls: a leaf verdict uses min/max of the granule's
NON-null values; null rows fail every comparison leaf (SQL semantics), so a
granule is safely skippable when no non-null value can match — including for
NotEq/NotIn, whose bounds rule is "prunable iff lo == hi == excluded value".

NaN semantics: comparisons follow IEEE (every comparison with NaN is false),
matching the reference — `LogicalInverseRewriter` rewrites not(ltEq(x)) to
gt(x), and Java primitive comparisons with NaN are false — and pyarrow's
compute kernels. This DIVERGES from SQL engines that totally order NaN as
the greatest value (DuckDB: `NOT (f <= x)` keeps NaN rows; here it drops
them, because the NNF leaf `f > x` is false for NaN). Filter NaN explicitly
(e.g. `is_nan` masks upstream) when SQL total-order behavior is needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

_LEAF_OPS = {"==", "!=", "<", "<=", ">", ">=", "in", "not_in", "udp",
             "is_null", "not_null"}
_INVERSE = {
    "==": "!=", "!=": "==", "<": ">=", "<=": ">", ">": "<=", ">=": "<",
    "in": "not_in", "not_in": "in", "is_null": "not_null",
    "not_null": "is_null",
}


@dataclass(frozen=True)
class Leaf:
    """One column comparison. ``op`` after normalize() is one of
    ==  !=  <  <=  >  >=  in  not_in  udp; for ``udp`` the value is a
    UserPredicate instance."""

    col: str
    op: str
    value: Any

    def __post_init__(self):
        if self.op not in _LEAF_OPS:
            raise ValueError(f"unknown predicate op {self.op!r}")
        if self.op in ("in", "not_in"):
            object.__setattr__(self, "value", tuple(self.value))


@dataclass(frozen=True)
class And:
    preds: tuple

    def __init__(self, *preds):
        if len(preds) == 1 and isinstance(preds[0], (list, tuple)):
            preds = tuple(preds[0])  # And([a, b]) == And(a, b)
        object.__setattr__(self, "preds", tuple(preds))


@dataclass(frozen=True)
class Or:
    preds: tuple

    def __init__(self, *preds):
        if len(preds) == 1 and isinstance(preds[0], (list, tuple)):
            preds = tuple(preds[0])  # Or([a, b]) == Or(a, b)
        object.__setattr__(self, "preds", tuple(preds))


@dataclass(frozen=True)
class Not:
    pred: Any


class UserPredicate:
    """`filter2/predicate/UserDefinedPredicate.java` analog. Subclass and
    override:

    - ``keep(array) -> bool mask``  (required; exact row evaluation)
    - ``can_drop(lo, hi) -> bool``  (optional; True when NO value in
      [lo, hi] can satisfy the predicate — enables granule pruning)
    - ``inverse_can_drop(lo, hi) -> bool`` (optional; True when EVERY value
      in [lo, hi] satisfies it — enables pruning under Not)
    """

    def keep(self, array):
        raise NotImplementedError

    def can_drop(self, lo, hi) -> bool:
        return False

    def inverse_can_drop(self, lo, hi) -> bool:
        return False


@dataclass(frozen=True)
class _InverseUdp(UserPredicate):
    """Not(udp) pushed to a leaf: swaps keep/can_drop polarity."""

    inner: UserPredicate

    def keep(self, array):
        import pyarrow.compute as pc

        return pc.invert(_as_bool_array(self.inner.keep(array)))

    def can_drop(self, lo, hi):
        return self.inner.inverse_can_drop(lo, hi)

    def inverse_can_drop(self, lo, hi):
        return self.inner.can_drop(lo, hi)


def _as_bool_array(m):
    import pyarrow as pa

    return m if isinstance(m, (pa.Array, pa.ChunkedArray)) else pa.array(m)


# Operator factories mirroring `filter2/predicate/FilterApi.java` names


def Eq(col, value):
    return Leaf(col, "==", value)


def NotEq(col, value):
    return Leaf(col, "!=", value)


def Lt(col, value):
    return Leaf(col, "<", value)


def LtEq(col, value):
    return Leaf(col, "<=", value)


def Gt(col, value):
    return Leaf(col, ">", value)


def GtEq(col, value):
    return Leaf(col, ">=", value)


def In(col, values):
    return Leaf(col, "in", values)


def NotIn(col, values):
    return Leaf(col, "not_in", values)


def Udp(col, user_predicate: UserPredicate):
    return Leaf(col, "udp", user_predicate)


def IsNull(col):
    """FilterApi eq(col, null) — matches exactly the null rows."""
    return Leaf(col, "is_null", None)


def NotNull(col):
    """FilterApi notEq(col, null) — matches exactly the non-null rows."""
    return Leaf(col, "not_null", None)


# ------------------------------------------------------------- normalization


def normalize(pred):
    """None | legacy [(col, op, value), ...] | tree -> NNF tree (or None)."""
    if pred is None:
        return None
    if isinstance(pred, (list, tuple)) and not isinstance(pred, Leaf):
        leaves = [Leaf(c, "in" if o == "in" else o, v) for c, o, v in pred]
        if not leaves:
            return None
        pred = And(*leaves) if len(leaves) > 1 else leaves[0]
    return _to_nnf(pred, False)


def _to_nnf(p, negate: bool):
    if isinstance(p, Not):
        return _to_nnf(p.pred, not negate)
    if isinstance(p, And):
        kids = [_to_nnf(k, negate) for k in p.preds]
        return Or(*kids) if negate else And(*kids)
    if isinstance(p, Or):
        kids = [_to_nnf(k, negate) for k in p.preds]
        return And(*kids) if negate else Or(*kids)
    if isinstance(p, Leaf):
        if not negate:
            return p
        if p.op == "udp":
            return Leaf(p.col, "udp", _InverseUdp(p.value))
        return Leaf(p.col, _INVERSE[p.op], p.value)
    raise TypeError(f"not a predicate: {p!r}")


def columns(pred) -> set[str]:
    if pred is None:
        return set()
    if isinstance(pred, Leaf):
        return {pred.col}
    if isinstance(pred, (And, Or)):
        out: set[str] = set()
        for k in pred.preds:
            out |= columns(k)
        return out
    if isinstance(pred, Not):
        return columns(pred.pred)
    raise TypeError(f"not a predicate: {pred!r}")


# --------------------------------------------------------------- exact masks


def leaf_mask(leaf: Leaf, arr):
    """Boolean mask of ``arr`` rows satisfying one leaf (nulls stay null)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if leaf.op == "is_null":
        # before the dictionary branch: null rows are null INDICES there,
        # and take() would turn the verdict null instead of true
        return pc.is_null(arr)
    if leaf.op == "not_null":
        return pc.is_valid(arr)
    if pa.types.is_dictionary(arr.type):
        # dictionary-aware evaluation (`DictionaryFilter.java` taken to row
        # granularity): run the leaf once over the NDV-sized dictionary,
        # then gather the verdicts by id. Null rows are null *indices*, and
        # pc.take propagates them to null verdicts — SQL semantics kept.
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        verdict = leaf_mask(leaf, arr.dictionary)
        return pc.take(verdict, arr.indices)
    if (
        pa.types.is_float16(arr.type)
        and leaf.op != "udp"
    ):
        # arrow compute has no halffloat comparison kernels; the float32
        # widening is exact, so verdicts are unchanged
        arr = arr.cast(pa.float32())
    if leaf.op == "udp":
        return _as_bool_array(leaf.value.keep(arr))
    if leaf.op in ("in", "not_in"):
        try:
            vset = pa.array(list(leaf.value))
        except (OverflowError, pa.ArrowInvalid):
            # values beyond int64 (uint64 columns): type to the column
            vset = pa.array(list(leaf.value), arr.type)
        m = pc.is_in(arr, value_set=vset)
        # keep SQL NOT IN semantics: null input -> null verdict either way
        if leaf.op == "not_in":
            m = pc.invert(m)
        null = pc.is_null(arr)
        return pc.if_else(null, pa.scalar(None, pa.bool_()), m)
    import pyarrow.compute as pc

    fn = {
        "==": pc.equal, "!=": pc.not_equal, "<": pc.less,
        "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
    }[leaf.op]
    try:
        v = pa.scalar(leaf.value)
    except (OverflowError, pa.ArrowInvalid):
        # a Python int >= 2^63 overflows the inferred int64 — type it to
        # the (unsigned) column instead
        v = pa.scalar(leaf.value, arr.type)
    return fn(arr, v)


def mask(pred, table):
    """Exact boolean mask over a table (None when pred is None). Kleene
    and/or so `a == 1 OR b == 2` matches SQL when a is null but b hits."""
    import pyarrow.compute as pc

    if pred is None:
        return None
    if isinstance(pred, Leaf):
        return leaf_mask(pred, table.column(pred.col))
    if isinstance(pred, And):
        m = mask(pred.preds[0], table)
        for k in pred.preds[1:]:
            m = pc.and_kleene(m, mask(k, table))
        return m
    if isinstance(pred, Or):
        m = mask(pred.preds[0], table)
        for k in pred.preds[1:]:
            m = pc.or_kleene(m, mask(k, table))
        return m
    if isinstance(pred, Not):
        return pc.invert(mask(pred.pred, table))
    raise TypeError(f"not a predicate: {pred!r}")


def filter_table(pred, table):
    m = mask(pred, table)
    return table if m is None else table.filter(m)


# ----------------------------------------------------------------- pruning


def may_match(pred, leaf_fn: Callable[[Leaf], bool]) -> bool:
    """Sound three-valued pruning: False only when NO row in the granule can
    satisfy ``pred``. ``leaf_fn`` answers the same question for one leaf
    given the call site's metadata; return True when unsure. ``pred`` must
    be NNF (from normalize())."""
    if pred is None:
        return True
    if isinstance(pred, Leaf):
        return bool(leaf_fn(pred))
    if isinstance(pred, And):
        return all(may_match(k, leaf_fn) for k in pred.preds)
    if isinstance(pred, Or):
        return any(may_match(k, leaf_fn) for k in pred.preds)
    raise TypeError(f"normalize() first: unexpected node {pred!r}")


def leaf_vs_bounds(leaf: Leaf, lo, hi, all_null: bool = False) -> bool:
    """Can any NON-null value in [lo, hi] satisfy the leaf? ``all_null``
    granules fail every comparison leaf (SQL semantics). is_null/not_null
    need null COUNTS these bounds don't carry: is_null stays True
    (call sites holding a null_count veto it themselves), not_null prunes
    exactly the all-null granules."""
    if leaf.op == "is_null":
        return True
    if leaf.op == "not_null":
        return not all_null and lo is not None
    if all_null or lo is None:
        return False
    if lo != lo or hi != hi:  # NaN bounds (older manifests): never skip
        return True
    if leaf.op == "udp":
        try:
            return not leaf.value.can_drop(lo, hi)
        except Exception:
            return True
    if leaf.op == "in":
        return any(
            leaf_vs_bounds(Leaf(leaf.col, "==", v), lo, hi)
            for v in leaf.value
        )
    if leaf.op == "not_in":
        return not (lo == hi and any(_cmp_eq(lo, v) for v in leaf.value))
    v = leaf.value
    if not _comparable(lo, v):
        return True
    v = _coerce(lo, v)
    if leaf.op == "==":
        return not (v < lo or v > hi)
    if leaf.op == "!=":
        return not (lo == hi and lo == v)
    if leaf.op == "<":
        return lo < v
    if leaf.op == "<=":
        return lo <= v
    if leaf.op == ">":
        return hi > v
    if leaf.op == ">=":
        return hi >= v
    return True


def leaf_vs_values(leaf: Leaf, arr) -> bool:
    """Dictionary-level veto (`filter2/dictionarylevel/DictionaryFilter.java`):
    can any member of the chunk's COMPLETE value set satisfy the leaf? Exact
    because the dictionary enumerates every distinct non-null value."""
    import pyarrow.compute as pc

    if leaf.op in ("is_null", "not_null"):
        return True  # dictionaries carry no null info
    if leaf.op in ("!=", "not_in"):
        # any dictionary value outside the excluded set satisfies it
        return bool(pc.any(_as_bool_array(leaf_mask(leaf, arr))).as_py() or False)
    m = leaf_mask(leaf, arr)
    got = pc.any(_as_bool_array(m)).as_py()
    return bool(got) if got is not None else False


def _comparable(lo, v) -> bool:
    if isinstance(lo, (str, bytes)):
        return isinstance(v, (str, bytes))
    return isinstance(v, (int, float)) and not isinstance(v, bool) or (
        isinstance(v, bool) and isinstance(lo, bool)
    )


def _coerce(lo, v):
    if isinstance(lo, bytes) and isinstance(v, str):
        return v.encode()
    if isinstance(lo, str) and isinstance(v, bytes):
        return v.decode("latin-1")
    return v


def _cmp_eq(lo, v) -> bool:
    return _comparable(lo, v) and _coerce(lo, v) == lo
