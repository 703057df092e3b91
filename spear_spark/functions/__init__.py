"""Function library — the reference's registered functions
(``/root/reference/spear-core/src/main/scala/spear/FunctionRegistry.scala:38-64``)
plus expression-level operators (SURVEY.md §2.4/§2.5), with semantics
shims wherever spear and Spark diverge.

Everything here returns a native ``Column`` built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen-eligible.
No Python UDFs in this module: at 100 TB every expression below runs
inside Tungsten.

Registered spear names (``FunctionRegistry.scala:38-64``): coalesce,
rand, length, array_agg, count, first, first_value, last, last_value,
max, min, average, avg, sum, product, bool_and, bool_or, concat,
named_struct, array, map.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "coalesce", "rand", "length", "array_agg", "count", "first",
    "first_value", "last", "last_value", "max", "min", "average", "avg",
    "sum", "product", "bool_and", "bool_or", "concat", "named_struct",
    "array", "map_", "power", "div", "nullif", "if_", "case_when",
    "greatest", "least", "isnan", "rlike", "in_", "null_safe_eq",
    "to_boolean", "lit", "col", "registry", "call_function",
]

lit = F.lit
col = F.col


def _c(x: Any) -> Column:
    return x if isinstance(x, Column) else (F.col(x) if isinstance(x, str) else F.lit(x))


# -- scalar functions ---------------------------------------------------------

def coalesce(*cols: Any) -> Column:
    """``Coalesce`` (``nullExpressions.scala:7-19``)."""
    return F.coalesce(*[_c(c) for c in cols])


def rand(seed: int | None = None) -> Column:
    """``Rand(seed)`` stateful per-row PRNG (``stateful.scala:9-25``).
    Spark's ``rand`` is partition-seeded: deterministic for a fixed
    partitioning, not row-for-row identical to the reference's
    sequential XORShift — documented divergence.  For an
    oracle-checkable, partitioning-independent variant see
    :func:`rand_like`."""
    return F.rand(seed) if seed is not None else F.rand()


def let_(bound: Column, body) -> Column:
    """Single-assignment let-binding for Column expressions: evaluate
    ``bound`` once per row and pass the resulting VALUE into ``body``.

    Why this exists: Spark's CollapseProject re-inlines a shared
    projection column into every consumer, and interpreted
    (CodegenFallback) expressions — which include every higher-order
    function — get no common-subexpression elimination, so a subtree
    referenced k times evaluates k times per row (measured 3-16× on
    shingle/minhash pipelines).  A HOF lambda argument, by contrast, is
    a bound evaluated value, so ``transform(array(bound), body)[1]`` is
    a genuine let.  Overhead: one single-element array per row."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def rand_like(key: Any, seed: int = 42) -> Column:
    """Deterministic uniform [0, 1) derived from a key column — the
    testable stand-in for the reference's sequential ``Rand``
    (``stateful.scala:9-25``), whose per-row XORShift state cannot be
    reproduced under distributed execution.  ``u = md5(seed_key)[:13
    hex] / 2^52``: the 52-bit numerator is exactly representable as a
    double and the divisor is a power of two, so the value is
    bit-identical in Spark and DuckDB and independent of partitioning —
    the property that makes sampling reproducible at any cluster size."""
    h = F.md5(F.concat_ws("_", F.lit(seed), _c(key).cast("string")))
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint") / F.lit(float(1 << 52))
    )


def length(c: Any) -> Column:
    """``Length`` accepts string / array / map (``misc.scala:7-18``);
    Spark splits this into ``length`` vs ``size`` — dispatch happens at
    analysis time via a conditional on the resolved type is impossible
    column-side, so callers use :func:`size` for collections.  For
    string columns this is ``F.length``."""
    return F.length(_c(c))


def size(c: Any) -> Column:
    return F.size(_c(c))


def concat(*cols: Any) -> Column:
    """spear ``Concat`` **skips nulls** (``stringExpressions.scala:12-22``)
    — Spark's ``concat`` is null-propagating, ``concat_ws`` reproduces
    the skip-null semantics (⚠ delta, SURVEY §2.4)."""
    return F.concat_ws("", *[_c(c) for c in cols])


def rlike(c: Any, pattern: str) -> Column:
    """``RLike`` with foldable pattern (``stringExpressions.scala:24-37``)."""
    return _c(c).rlike(pattern)


def power(a: Any, b: Any) -> Column:
    """spear's ``^`` operator is POWER (``arithmetics.scala:99-109``);
    in Spark SQL ``^`` is bitwise XOR (⚠ grammar delta)."""
    return F.pow(_c(a), _c(b))


def div(a: Any, b: Any) -> Column:
    """spear ``Divide`` on integral types is integer division
    (``arithmetics.scala:70-80``); Spark ``/`` always returns double —
    use the registered ``div`` function (Catalyst ``IntegralDivide``,
    truncation toward zero like Scala's integral ``/``), which is exact
    over the full int64 range.  The earlier ``(a / b).cast("long")``
    routed through double division and silently lost precision for
    |operands| > 2^53."""
    return F.call_function("div", _c(a), _c(b))


def isnan(c: Any) -> Column:
    return F.isnan(_c(c))


def greatest(*cols: Any) -> Column:
    """Null-smallest semantics: nulls ignored (``arithmetics.scala:126-156``)
    — matches Spark."""
    return F.greatest(*[_c(c) for c in cols])


def least(*cols: Any) -> Column:
    return F.least(*[_c(c) for c in cols])


def nullif(a: Any, b: Any) -> Column:
    """Parser sugar ``NULLIF(a,b)`` → ``If(a=b, null, a)``
    (``ValueExpressionParser.scala:209-212``)."""
    return F.nullif(_c(a), _c(b))


def if_(cond: Any, then: Any, otherwise: Any) -> Column:
    """``If`` (``logicalOperators.scala:42-55``)."""
    return F.when(_c(cond), _c(then)).otherwise(_c(otherwise))


def case_when(*branches: tuple, else_: Any = None) -> Column:
    """Searched CASE (``CaseWhen``, ``logicalOperators.scala:57-108``)."""
    out = None
    for cond, value in branches:
        out = F.when(_c(cond), _c(value)) if out is None else out.when(_c(cond), _c(value))
    return out.otherwise(_c(else_)) if else_ is not None else out


def in_(c: Any, *values: Any) -> Column:
    """``In`` (``comparisons.scala:66-84``)."""
    return _c(c).isin(*values)


def null_safe_eq(a: Any, b: Any) -> Column:
    """``<=>`` (``comparisons.scala:29-40``)."""
    return _c(a).eqNullSafe(_c(b))


def to_boolean(c: Any) -> Column:
    """spear string→boolean cast accepts yes/no/t/f/on/off/1/0
    (``Cast.scala:129-146``) — wider than Spark's cast, so pinned here."""
    s = F.lower(F.trim(_c(c)))
    return (
        F.when(s.isin("true", "t", "yes", "y", "on", "1"), F.lit(True))
        .when(s.isin("false", "f", "no", "n", "off", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


# -- complex-type constructors (complexTypes.scala:7-88) ----------------------

def named_struct(*name_value_pairs: Any) -> Column:
    """``MakeNamedStruct`` (``complexTypes.scala:7-47``)."""
    cols = []
    for i in range(0, len(name_value_pairs), 2):
        cols.append(_c(name_value_pairs[i + 1]).alias(name_value_pairs[i]))
    return F.struct(*cols)


def array(*cols: Any) -> Column:
    """``MakeArray`` (``complexTypes.scala:49-64``)."""
    return F.array(*[_c(c) for c in cols])


def map_(*key_value_pairs: Any) -> Column:
    """``MakeMap`` (``complexTypes.scala:66-88``)."""
    return F.create_map(*[_c(c) for c in key_value_pairs])


# -- aggregate functions (aggregates/, SURVEY §2.5) ---------------------------

def count(c: Any = None) -> Column:
    """``Count`` counts non-null; ``count(*)`` → ``Count(1)``
    (``expressionsAnalysis.scala:83-87``)."""
    # isinstance guard: `c == "*"` on a Column builds a comparison Column
    # whose truthiness raises — only test equality for real strings.
    if c is None or (isinstance(c, str) and c == "*"):
        return F.count(F.lit(1))
    return F.count(_c(c))


def max(c: Any) -> Column:  # noqa: A001 - mirrors the reference's name
    return F.max(_c(c))


def min(c: Any) -> Column:  # noqa: A001
    return F.min(_c(c))


def sum(c: Any) -> Column:  # noqa: A001
    """``Sum`` — null when all inputs null (``numeric.scala:38-42``),
    matches Spark."""
    return F.sum(_c(c))


def avg(c: Any) -> Column:
    """``Average`` — DOUBLE result, null on empty (``numeric.scala:9-36``)."""
    return F.avg(_c(c))


average = avg


def product(c: Any) -> Column:
    """``Product_`` (``numeric.scala:44-50``)."""
    return F.product(_c(c))


def bool_and(c: Any) -> Column:
    """``BoolAnd`` (``aggregates/logical.scala:8-14``)."""
    return F.bool_and(_c(c))


def bool_or(c: Any) -> Column:
    """``BoolOr`` (``aggregates/logical.scala:16-22``)."""
    return F.bool_or(_c(c))


def first(c: Any, ignore_nulls: bool = False) -> Column:
    """``First(child, ignoresNull)`` (``basic.scala:38-72``). Impure in
    the reference too; under distributed execution the value is
    partition-order dependent — pair with an ordered window for
    determinism."""
    return F.first(_c(c), ignorenulls=ignore_nulls)


first_value = first


def last(c: Any, ignore_nulls: bool = False) -> Column:
    return F.last(_c(c), ignorenulls=ignore_nulls)


last_value = last


def array_agg(c: Any, sort: bool = False, order_by: Any = None) -> Column:
    """``ArrayAgg`` keeps nulls and arrival order (``basic.scala:110-126``).
    Spark's ``collect_list`` drops nulls (⚠ delta) — wrap each value in
    a struct (never null) and unwrap, which preserves nulls.  Arrival
    order is nondeterministic under distributed execution, so callers
    pick a deterministic policy instead:

    * ``sort=True`` — canonical value order (nulls last, matching
      spear's nulls-larger ordering);
    * ``order_by=<key column>`` — reproduce a specific arrival order
      (e.g. an event timestamp or line number): values are collected as
      (key, value) structs, sorted by key, then unwrapped.  This is how
      a caller recovers the reference's sequential arrival-order
      semantics on a cluster, where physical arrival order isn't stable.
    """
    if order_by is not None:
        wrapped = F.collect_list(F.struct(_c(order_by).alias("k"), _c(c).alias("v")))
        return F.transform(F.array_sort(wrapped), lambda s: s.getField("v"))
    wrapped = F.collect_list(F.struct(_c(c).alias("v")))
    arr = F.transform(wrapped, lambda s: s.getField("v"))
    return F.array_sort(arr) if sort else arr


# -- function registry (FunctionRegistry.scala:20-36) -------------------------

registry: dict[str, Any] = {
    "coalesce": coalesce,
    "rand": rand,
    "length": length,
    "size": size,
    "array_agg": array_agg,
    "count": count,
    "first": first,
    "first_value": first_value,
    "last": last,
    "last_value": last_value,
    "max": max,
    "min": min,
    "average": average,
    "avg": avg,
    "sum": sum,
    "product": product,
    "bool_and": bool_and,
    "bool_or": bool_or,
    "concat": concat,
    "named_struct": named_struct,
    "array": array,
    "map": map_,
    "power": power,
    "div": div,
    "nullif": nullif,
    "if": if_,
    "greatest": greatest,
    "least": least,
    "isnan": isnan,
    "rlike": rlike,
    "in": in_,
    "to_boolean": to_boolean,
}


def call_function(name: str, *args: Any, **kwargs: Any) -> Column:
    """Name → builder dispatch, the reference's reflective constructor
    lookup (``FunctionRegistry.scala:66-90``) done the Python way.
    Unknown names fall through to Spark's own registry via
    ``F.call_function`` — i.e. the full Spark function library is the
    extension surface, exactly as Catalyst UDF registration would be."""
    fn = registry.get(name.lower())
    if fn is not None:
        return fn(*args, **kwargs)
    return F.call_function(name, *[_c(a) for a in args])


def register(name: str, builder: Any) -> None:
    """User extension point (mirrors ``FunctionRegistry.registerFunction``,
    ``FunctionRegistry.scala:22-24``)."""
    registry[name.lower()] = builder
