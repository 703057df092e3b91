"""Expression → SQL emitter — the reference's SQL builder surface
(``spear-core/src/test/scala/spear/ExpressionSQLBuilderSuite.scala``,
``SQLBuilderTest.scala``: every ``Expression`` carries ``.sql``, and the
suite pins expression → SQL text), re-expressed for the Spark facade.

The facade's expressions are native ``pyspark.sql.Column`` trees, so the
emitter leans on Catalyst rather than re-implementing a printer: the
column is resolved against a schema (one ``select`` → analyzed plan, no
job runs) and the bound Catalyst expression's canonical ``.sql()`` text
is harvested.  That text is Spark-dialect; :func:`to_sql` then applies
the inverse of the ``sql_dialect`` deltas so the emitted string is
valid **spear-dialect** SQL:

* Catalyst ``POWER(a, b)`` → spear ``(a ^ b)`` (the reference parses
  ``^`` as power, ``ValueExpressionParser.scala:318-319``);
* a genuine bitwise-XOR column has NO spear-SQL form (spear's ``^`` is
  power) → raise, mirroring the reference where non-SQL-expressible
  expressions make ``Expression.sql`` empty and ``.sql.get`` throw
  (``ExpressionSQLBuilderSuite.scala`` "non-SQL expressions");
* Catalyst ``negative(a)`` → ``(- a)`` (the reference prints ``(-a)``);
* lowercase ``true``/``false`` literals → ``TRUE``/``FALSE``;
* string literals are re-escaped SQL-2006-style (``''`` doubling, with
  backslashes doubled so Spark's backslash-escaping lexer reads them
  back verbatim) — the reference emits ``\\'`` escapes instead; both
  forms reparse to the same value in their own dialect.

Round-trip law (tested in ``tests/test_sql_builder.py``, the analog of
``SQLBuilderTest.checkSQL``): for every expression in the q20/q48
corpus, ``parse_expression(to_sql(e, df), df)`` is value-identical to
``e`` and re-emits the SAME text (fixpoint), i.e.
``to_sql ∘ parse_expression ∘ to_sql == to_sql``.

Scope: scalar, aggregate, and windowed expressions.  Expressions whose
analyzed form is not a single named expression (e.g. a bare ``*``
star) are out of scope and raise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expression_sql", "to_sql", "parse_expression"]

_TAG = "__sql_builder__"


def _find_tagged_expr(jplan):
    """Recursively scan an analyzed logical plan for the Alias named
    ``_TAG`` and return its child Catalyst expression.  Window
    expressions need the recursion: the analyzer moves the Alias into
    the Window node and leaves only an attribute in the top
    projection."""
    exprs = jplan.expressions()
    for i in range(exprs.size()):
        e = exprs.apply(i)
        try:
            name = e.name()
        except Exception:  # noqa: BLE001 — not a NamedExpression
            continue
        if name == _TAG and e.children().size() > 0:
            return e.children().apply(0)
    kids = jplan.children()
    for i in range(kids.size()):
        found = _find_tagged_expr(kids.apply(i))
        if found is not None:
            return found
    return None


def _tagged_expr(col: Column, df: DataFrame):
    jdf = df.select(col.alias(_TAG))._jdf
    plan = jdf.queryExecution().analyzed()
    jexpr = _find_tagged_expr(plan)
    if jexpr is None:
        raise ValueError(
            "expression_sql: could not locate the expression in the "
            "analyzed plan — multi-output expressions (star, explode) "
            "are not SQL-expressible as a single expression"
        )
    return jexpr


def _ignore_nulls_flags(jexpr, cls: str) -> list[bool]:
    """Collect the ``ignoreNulls`` flags of every First/Last node in
    the tree (pre-order).  Catalyst's SQL printer DROPS the flag —
    ``First(a, ignoreNulls=true).sql`` is just ``first(a)`` — so the
    emitter re-attaches it from the tree."""
    flags: list[bool] = []
    if jexpr.getClass().getSimpleName() == cls:
        flags.append(bool(jexpr.ignoreNulls()))
    kids = jexpr.children()
    for i in range(kids.size()):
        flags.extend(_ignore_nulls_flags(kids.apply(i), cls))
    return flags


def _struct_names_preorder(jexpr) -> list[list[str]]:
    """Pre-order list of every CreateNamedStruct node's field-name
    literal SQLs.  Catalyst's printer drops struct field names —
    ``CreateNamedStruct('x', a, 'y', b).sql`` is ``struct(a, b)`` — so
    the emitter re-attaches them from the tree (children alternate
    name-literal, value)."""
    out: list[list[str]] = []
    if jexpr.getClass().getSimpleName() == "CreateNamedStruct":
        ch = jexpr.children()
        out.append([ch.apply(i).sql() for i in range(0, ch.size(), 2)])
    kids = jexpr.children()
    for i in range(kids.size()):
        out.extend(_struct_names_preorder(kids.apply(i)))
    return out


def _patch_struct_calls(text: str, names: list[list[str]]) -> str:
    """Replace each bare ``struct(v1, v2, ...)`` call with
    ``named_struct('n1', v1, 'n2', v2, ...)``, consuming ``names`` in
    pre-order (text position order of the tokens IS the printer's
    pre-order).  A ``named_struct(...)`` call already carries its
    names (Catalyst prints parser-built CreateNamedStruct that way but
    DataFrame-built ones as name-dropping ``struct(...)``) — its names
    entry is consumed and the call kept verbatim.  Literals must
    already be protected."""
    it = iter(names)

    def _word(c: str) -> bool:
        return c.isalnum() or c == "_"

    def patch(s: str) -> str:
        lower = s.lower()
        out: list[str] = []
        i = 0
        while True:
            j = lower.find("struct(", i)
            named = False
            while j >= 0:
                if (
                    j >= 6
                    and lower[j - 6 : j] == "named_"
                    and (j == 6 or not _word(lower[j - 7]))
                ):
                    named = True
                    break
                if j == 0 or not _word(lower[j - 1]):
                    break
                j = lower.find("struct(", j + 1)
            if j < 0:
                out.append(s[i:])
                return "".join(out)
            start = j - 6 if named else j
            out.append(s[i:start])
            my_names = next(it)
            depth = 0
            k = j + len("struct(")
            while k < len(s):
                if s[k] == "(":
                    depth += 1
                elif s[k] == ")":
                    if depth == 0:
                        break
                    depth -= 1
                k += 1
            inner = patch(s[j + len("struct(") : k])
            if named:
                out.append(f"named_struct({inner})")
                i = k + 1
                continue
            args: list[str] = []
            depth = 0
            last = 0
            for idx, c in enumerate(inner):
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == "," and depth == 0:
                    args.append(inner[last:idx])
                    last = idx + 1
            args.append(inner[last:])
            if len(args) != len(my_names):
                raise ValueError(
                    "expression_sql: struct() arity does not match the "
                    "CreateNamedStruct tree — printer drift; cannot "
                    "re-attach field names"
                )
            pairs = ", ".join(
                f"{n}, {a.strip()}" for n, a in zip(my_names, args)
            )
            out.append(f"named_struct({pairs})")
            i = k + 1

    patched = patch(text)
    rest = next(it, None)
    if rest is not None:
        raise ValueError(
            "expression_sql: fewer struct() calls in the printed text "
            "than CreateNamedStruct nodes in the tree — printer drift"
        )
    return patched


def expression_sql(col: Column, df: DataFrame) -> str:
    """Canonical **Spark-dialect** SQL text of ``col`` resolved against
    ``df``'s schema (analysis only — no job runs).  This is the
    mechanical core; :func:`to_sql` layers the spear-dialect deltas on
    top.

    Two Catalyst printer defects are repaired here from the expression
    tree, because the printed text alone is lossy:

    * ``first``/``last`` with ``ignoreNulls=true`` print identically
      to the null-keeping form → re-emitted as the two-argument form
      ``first(a, TRUE)`` (the syntax Spark's own parser accepts);
    * ``CreateNamedStruct`` prints as ``struct(values...)`` with the
      field names DROPPED → re-emitted as ``named_struct('n', v, ...)``
      with the names recovered from the tree."""
    jexpr = _tagged_expr(col, df)
    sql = jexpr.sql()
    for cls, fname in (("First", "first"), ("Last", "last")):
        flags = _ignore_nulls_flags(jexpr, cls)
        if any(flags):
            if not all(flags):
                raise ValueError(
                    f"expression_sql: mixed {fname}() ignore-nulls "
                    "flags in one expression — Catalyst's printer "
                    "cannot distinguish the call sites; split the "
                    "expression"
                )
            text, subst = _protect_literals(sql)
            text = _rewrite_call(
                text, fname, lambda a, f=fname: f"{f}({', '.join(a)}, TRUE)"
            )
            sql = _restore_literals(text, subst)
    struct_names = _struct_names_preorder(jexpr)
    if struct_names:
        text, subst = _protect_literals(sql)
        text = _patch_struct_calls(text, struct_names)
        sql = _restore_literals(text, subst)
    return sql


# -- spear-dialect post-processing --------------------------------------------


def _split_literals(text: str) -> list[tuple[bool, str]]:
    """Split Catalyst-emitted SQL into (is_literal, chunk) segments.
    Catalyst string literals escape ``'`` and ``\\`` with backslashes
    (``literals.sql`` → ``escapeSingleQuotedString``), so the scan is
    backslash-aware — unlike the SQL-2006 lexer in ``sql_dialect``."""
    parts: list[tuple[bool, str]] = []
    i, n = 0, len(text)
    start = 0
    while i < n:
        if text[i] == "'":
            parts.append((False, text[start:i]))
            j = i + 1
            while j < n:
                if text[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if text[j] == "'":
                    break
                j += 1
            parts.append((True, text[i : j + 1]))
            i = j + 1
            start = i
            continue
        i += 1
    parts.append((False, text[start:]))
    return parts


def _decode_catalyst_literal(chunk: str) -> str:
    """``'a\\'b'`` → raw value ``a'b`` (undo Catalyst's escaping)."""
    body = chunk[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        if body[i] == "\\" and i + 1 < len(body):
            out.append(body[i + 1])
            i += 2
            continue
        out.append(body[i])
        i += 1
    return "".join(out)


def _encode_spear_literal(value: str) -> str:
    """Raw value → SQL-2006 literal that ALSO survives Spark's
    backslash-escaping lexer: quotes doubled, backslashes doubled."""
    return "'" + value.replace("\\", "\\\\").replace("'", "''") + "'"


def _protect_literals(text: str) -> tuple[str, list[str]]:
    """Substitute string literals out (``\\x01<i>\\x01`` placeholders)
    so paren/comma scans never trip on quoted content."""
    subst: list[str] = []
    out: list[str] = []
    for is_lit, chunk in _split_literals(text):
        if not is_lit:
            out.append(chunk)
            continue
        subst.append(chunk)
        out.append(f"\x01{len(subst) - 1}\x01")
    return "".join(out), subst


def _restore_literals(text: str, subst: list[str]) -> str:
    import re

    return re.sub("\x01(\\d+)\x01", lambda m: subst[int(m.group(1))], text)


def _rewrite_call(text: str, fname: str, shape) -> str:
    """Replace every ``fname(arg1, arg2, ...)`` call (case-insensitive,
    balanced-paren aware, top-level comma split) with ``shape(args)``.
    Literals have already been substituted out, so paren/comma scanning
    is safe."""
    lower = text.lower()
    needle = fname.lower() + "("
    out: list[str] = []
    i = 0
    while True:
        j = lower.find(needle, i)
        # must not be a suffix of a longer identifier
        while j > 0 and (lower[j - 1].isalnum() or lower[j - 1] == "_"):
            j = lower.find(needle, j + 1)
        if j < 0:
            out.append(text[i:])
            return "".join(out)
        out.append(text[i:j])
        depth = 0
        args: list[str] = []
        arg_start = j + len(needle)
        k = arg_start
        while k < len(text):
            c = text[k]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    args.append(text[arg_start:k])
                    break
                depth -= 1
            elif c == "," and depth == 0:
                args.append(text[arg_start:k])
                arg_start = k + 1
            k += 1
        inner = _rewrite_call(text[j + len(needle) : k], fname, shape)
        # re-split the recursed inner text
        args2: list[str] = []
        depth = 0
        last = 0
        for idx, c in enumerate(inner):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                args2.append(inner[last:idx])
                last = idx + 1
        args2.append(inner[last:])
        out.append(shape([a.strip() for a in args2]))
        i = k + 1


def to_sql(col: Column, df: DataFrame) -> str:
    """spear-dialect SQL text of ``col`` resolved against ``df`` — the
    facade analog of the reference's ``Expression.sql``
    (``ExpressionSQLBuilderSuite.scala``).  Raises for expressions with
    no spear-SQL form (bitwise XOR — spear's ``^`` means power), like
    the reference's ``.sql.get`` on a non-SQL expression."""
    parts = _split_literals(expression_sql(col, df))
    subst: list[str] = []
    text_parts: list[str] = []
    for is_lit, chunk in parts:
        if not is_lit:
            text_parts.append(chunk)
            continue
        subst.append(_encode_spear_literal(_decode_catalyst_literal(chunk)))
        text_parts.append(f"\x01{len(subst) - 1}\x01")
    text = "".join(text_parts)

    if "^" in text:
        raise ValueError(
            "to_sql: bitwise XOR has no spear-SQL form (spear's '^' "
            "operator is POWER) — not SQL-expressible in this dialect"
        )
    # Catalyst POWER(a, b) → spear (a ^ b); negative(a) → (- a)
    text = _rewrite_call(text, "POWER", lambda a: f"({a[0]} ^ {a[1]})")
    text = _rewrite_call(text, "negative", lambda a: f"(- {a[0]})")
    # boolean literals: spear prints TRUE/FALSE
    text = text.replace(" true", " TRUE").replace("(true", "(TRUE")
    text = text.replace(" false", " FALSE").replace("(false", "(FALSE")
    if text == "true":
        text = "TRUE"
    if text == "false":
        text = "FALSE"

    import re

    return re.sub(
        "\x01(\\d+)\x01", lambda m: subst[int(m.group(1))], text
    )


def parse_expression(sql_text: str, df: DataFrame) -> Column:
    """spear-dialect expression text → ``Column``, via the same dialect
    shim the SQL entry point uses (``sql_dialect.to_spark_sql``) and
    Spark's expression parser.  ``to_sql`` ∘ ``parse_expression`` is a
    fixpoint — the round-trip law ``tests/test_sql_builder.py`` pins."""
    from spear_spark.sql_dialect import to_spark_sql

    return F.expr(to_spark_sql(sql_text))
