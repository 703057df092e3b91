"""spear SQL dialect shim (SURVEY §7 phase 2).

Spark SQL is a strict superset of spear's SQL-2006 subset except for
a handful of grammar-level deltas.  The policy per delta:

* bare ``UNION`` — spear parses it as **bag** union
  (``QueryExpressionParser.scala:364-381``); Spark/ANSI dedup.
  Rewritten here to ``UNION ALL`` (token-level, string-literal-safe).
* bare ``INTERSECT`` / ``EXCEPT`` — spear's set operators are
  *multiset* (``basicOperators.scala:61-76``); Spark/ANSI dedup.
  Rewritten to ``INTERSECT ALL`` / ``EXCEPT ALL``.
* ``^`` — spear parses power (``ValueExpressionParser.scala:318-319``:
  ``factor = base fold "^"``, i.e. tighter than ``*``/``/``/``%``,
  left-associative, unary sign bound into the base); Spark parses
  bitwise XOR.  Rewritten to ``power(a, b)`` by a precedence-aware
  operand scanner; anything the scanner cannot shape is **rejected**
  with guidance — loud divergence beats silent wrongness.
* ``TIME(p)`` / ``TIMESTAMP(p)`` type precision — spear-only; the
  precision parameter has no Spark analog (SURVEY §1.2) and is dropped
  by the same token pass.
* double-quoted identifiers (SQL-2006 delimited identifiers) — Spark
  reads ``"x"`` as a string literal by default; rewritten to
  backtick-quoted identifiers.
* ``U&"..."`` Unicode delimited identifiers with optional
  ``UESCAPE 'c'`` (SQL-2006 §5.2; reference grammar
  ``IdentifierParser.scala``) — decoded here (``\\XXXX`` BMP,
  ``\\+XXXXXX`` full codepoint, doubled escape = literal) and emitted
  as backtick identifiers; dangling escapes are rejected like the
  reference's illegal-identifier cases.
* adjacent character-string literals ``'a' 'b'`` concatenate to
  ``'ab'`` (SQL-2006 §5.3 <character string literal>; reference
  ``ValueExpressionParserSuite``: ``"'a' 'b'" -> "ab"``) — Spark would
  read the second literal as an alias.  Merged at the lexical pass.
* multi-valued simple CASE ``CASE x WHEN 1, 2 THEN ...`` (SQL-2006
  §6.11; reference ``CaseWhenParser`` simple-when-clause) — Spark's
  simple CASE takes exactly one value per WHEN.  Rewritten to the
  searched form ``CASE WHEN (x) IN (1, 2) THEN ...`` which has
  identical null/equality semantics.
* ``ROW(name TYPE, ...)`` type syntax (SQL-2006 row type; reference
  ``DataTypeParser``) → ``STRUCT<name: TYPE, ...>``.  Unquoted field
  names are upper-cased to mirror the reference's SQL case folding
  (``DataTypeParserSuite``: ``ROW(name STRING)`` → field ``NAME``);
  quoted names keep their case.
* named-window inheritance ``WINDOW w0 AS (), w1 AS (w0 ROWS ...)``
  (SQL-2006 §7.11; reference ``WindowClauseParser``) — Spark's WINDOW
  clause cannot reference another named window; the base spec is
  inlined textually.
* aggregate function in ORDER BY without GROUP BY — spear resolves it
  to a **global aggregate** returning one row
  (``aggregationAnalysis.scala:95-110``); Spark rejects the form, so
  ``HAVING TRUE`` is inserted to force the same global aggregation.

Known *analyzer-level* deltas that a token-level shim cannot bridge
(documented in ``tests/test_parser_parity.py``):

* spear implicitly casts Int → Boolean (``Cast.scala:75``: value ≠ 0),
  so ``CASE WHEN 1 THEN ...`` executes; Spark ANSI requires a real
  boolean — write ``<> 0`` explicitly.
* spear's ``/`` over two integral operands truncates
  (``arithmetics.scala`` IntegralDivide); Spark's ``/`` is always
  fractional — the DSL facade handles this (``functions.div``), SQL
  callers use ``DIV``.
"""

from __future__ import annotations

import re

# token before a +/- that makes the sign UNARY (part of the operand):
# any operator/punctuation, or one of these keywords.  An identifier or
# literal before the sign means binary +/-.
_UNARY_SIGN_PREDECESSORS = frozenset(
    "select where when then else and or not on by in having case like "
    "between union all distinct from as is return returns".split()
)


_UESCAPE_RE = re.compile(r"\s*UESCAPE\s*'(.)'", re.IGNORECASE)


def _decode_unicode_ident(body: str, esc: str) -> str:
    """Decode a ``U&"..."`` identifier body (``""`` already undoubled):
    ``<esc>XXXX`` = BMP codepoint, ``<esc>+XXXXXX`` = full codepoint,
    ``<esc><esc>`` = literal escape char.  Dangling/malformed escapes
    raise — the reference parser rejects them too
    (``IdentifierParserSuite.scala:60-67`` failedCases)."""
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == esc:
            if i + 1 < n and body[i + 1] == esc:
                out.append(esc)
                i += 2
                continue
            if i + 1 < n and body[i + 1] == "+":
                hexs = body[i + 2 : i + 8]
                if len(hexs) == 6 and all(h in "0123456789abcdefABCDEF" for h in hexs):
                    out.append(chr(int(hexs, 16)))
                    i += 8
                    continue
                raise ValueError(
                    f"malformed Unicode escape in U&-identifier: {body!r}"
                )
            hexs = body[i + 1 : i + 5]
            if len(hexs) == 4 and all(h in "0123456789abcdefABCDEF" for h in hexs):
                out.append(chr(int(hexs, 16)))
                i += 5
                continue
            raise ValueError(f"malformed Unicode escape in U&-identifier: {body!r}")
        out.append(c)
        i += 1
    return "".join(out)


def _strip_strings(sql: str) -> list[tuple[str, str]]:
    """Split into (kind, chunk) segments where kind is ``code``,
    ``str`` (single-quoted literal, '' escapes) or ``ident``
    (double-quoted identifier, "" escapes) so rewrites never touch
    quoted content.  ``U&"..." [UESCAPE 'c']`` Unicode identifiers are
    decoded here and re-emitted as plain delimited identifiers."""
    parts: list[tuple[str, str]] = []
    i, n = 0, len(sql)
    buf: list[str] = []
    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            code = "".join(buf)
            unicode_ident = False
            if (
                c == '"'
                and code[-2:].upper() == "U&"
                and (len(code) == 2 or not (code[-3].isalnum() or code[-3] == "_"))
            ):
                unicode_ident = True
                code = code[:-2]
            parts.append(("code", code))
            buf = []
            j = i + 1
            while j < n:
                if sql[j] == c and j + 1 < n and sql[j + 1] == c:
                    j += 2
                    continue
                if sql[j] == c:
                    break
                j += 1
            chunk = sql[i : j + 1]
            i = j + 1
            if unicode_ident:
                esc = "\\"
                m = _UESCAPE_RE.match(sql, i)
                if m:
                    esc = m.group(1)
                    i = m.end()
                decoded = _decode_unicode_ident(chunk[1:-1].replace('""', '"'), esc)
                chunk = '"' + decoded.replace('"', '""') + '"'
            parts.append(("str" if c == "'" else "ident", chunk))
        else:
            buf.append(c)
            i += 1
    parts.append(("code", "".join(buf)))
    return parts


def _merge_adjacent_strings(
    parts: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """SQL-2006 §5.3: character-string literals separated only by
    whitespace concatenate (``'a' 'b'`` ≡ ``'ab'``).  Spark would read
    the second literal as a column alias, so merge lexically."""
    out: list[tuple[str, str]] = []
    for kind, chunk in parts:
        if (
            kind == "str"
            and len(out) >= 2
            and out[-1][0] == "code"
            and out[-1][1] != ""
            and out[-1][1].isspace()
            and out[-2][0] == "str"
        ):
            prev = out[-2][1]
            out.pop()
            out[-1] = ("str", prev[:-1] + chunk[1:])
            continue
        out.append((kind, chunk))
    return out


def _scan_left_operand(s: str, pos: int) -> int | None:
    """Return the start index of the ``^`` left operand ending at
    ``pos`` (exclusive), or None if no operand shape is recognized.
    Handles: balanced-paren group (with optional function-name /
    qualified prefix), qualified identifiers, numeric literals, and a
    unary sign when grammar position makes it unary."""
    i = pos
    while i > 0 and s[i - 1].isspace():
        i -= 1
    if i == 0:
        return None
    if s[i - 1] == ")":
        depth = 0
        j = i
        while j > 0:
            j -= 1
            if s[j] == ")":
                depth += 1
            elif s[j] == "(":
                depth -= 1
                if depth == 0:
                    break
        if depth != 0:
            return None
        # optional function name / qualified prefix before the '('
        k = j
        while k > 0 and (s[k - 1].isalnum() or s[k - 1] in "_."):
            k -= 1
        start = k if k < j else j
    elif s[i - 1].isalnum() or s[i - 1] in "_.":
        k = i
        while k > 0 and (s[k - 1].isalnum() or s[k - 1] in "_."):
            k -= 1
        # a bare SQL keyword is not an operand (e.g. "SELECT ^ 3")
        if s[k:i].lower() in _UNARY_SIGN_PREDECESSORS:
            return None
        start = k
    else:
        return None
    # optional unary sign (base = sign.? ~ numericPrimary)
    j = start
    while j > 0 and s[j - 1].isspace():
        j -= 1
    if j > 0 and s[j - 1] in "+-":
        k = j - 1
        while k > 0 and s[k - 1].isspace():
            k -= 1
        if k == 0:
            return j - 1
        prev = s[k - 1]
        if not (prev.isalnum() or prev in "_.)'\""):
            return j - 1
        # word before the sign: unary only after a keyword
        m = re.search(r"([A-Za-z_][A-Za-z0-9_]*)\s*$", s[:k])
        if m and m.group(1).lower() in _UNARY_SIGN_PREDECESSORS:
            return j - 1
    return start


def _scan_right_operand(s: str, pos: int) -> int | None:
    """Return the end index (exclusive) of the ``^`` right operand
    starting at ``pos``, or None if unrecognized."""
    i = pos
    n = len(s)
    while i < n and s[i].isspace():
        i += 1
    if i < n and s[i] in "+-":  # right side of an operator: sign is unary
        i += 1
        while i < n and s[i].isspace():
            i += 1
    if i >= n:
        return None
    if s[i] == "(":
        depth = 0
        while i < n:
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        return None
    if s[i].isalnum() or s[i] in "_.":
        while i < n and (s[i].isalnum() or s[i] in "_."):
            i += 1
        # function call?
        j = i
        while j < n and s[j].isspace():
            j += 1
        if j < n and s[j] == "(":
            depth = 0
            while j < n:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                    if depth == 0:
                        return j + 1
                j += 1
            return None
        return i
    return None


def _rewrite_power(chunk: str) -> str:
    """Rewrite every ``a ^ b`` in a code chunk to ``power(a, b)``,
    left-to-right so chains fold left-associatively like the reference
    (``a ^ b ^ c`` → ``power(power(a, b), c)``)."""
    while True:
        pos = chunk.find("^")
        if pos == -1:
            return chunk
        lo = _scan_left_operand(chunk, pos)
        hi = _scan_right_operand(chunk, pos + 1)
        if lo is None or hi is None:
            raise ValueError(
                "cannot rewrite spear-dialect '^' (power) at a recognizable "
                "operand boundary; use power(a, b) explicitly"
            )
        left = chunk[lo:pos].strip()
        right = chunk[pos + 1 : hi].strip()
        chunk = f"{chunk[:lo]}power({left}, {right}){chunk[hi:]}"


_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_CASE_RE = re.compile(r"\bCASE\b", re.IGNORECASE)
_ROW_RE = re.compile(r"\bROW\s*\(", re.IGNORECASE)
_PLAIN_NAME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9_]*$")
_PLACEHOLDER_RE = re.compile("\x01(\\d+)\x01")


def _split_top_commas(s: str) -> list[str]:
    """Split on commas at paren depth 0 (quoted content is already
    placeholder-encoded, so no quote tracking is needed here)."""
    items: list[str] = []
    depth, start = 0, 0
    for idx, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(s[start:idx])
            start = idx + 1
    items.append(s[start:])
    return items


def _rewrite_simple_cases(text: str) -> str:
    """Rewrite SQL-2006 multi-valued simple CASE (reference
    ``CaseWhenParser``: ``WHEN rowValuePredicand.rep(1, ",") THEN``)
    into the searched form: ``CASE x WHEN 1, 2 THEN r ELSE s END`` →
    ``CASE WHEN (x) IN (1, 2) THEN r ELSE s END``.  ``IN`` has the
    same equality/null semantics as simple-CASE matching.  Single-value
    simple CASE and searched CASE pass through untouched."""
    m = _CASE_RE.search(text)
    if m is None:
        return text
    # scan forward for this CASE's top-level WHEN/THEN/ELSE and its
    # matching END, tracking nested CASE and paren depth
    depth_case, depth_paren = 1, 0
    markers: list[tuple[str, int, int]] = []
    end_kw: tuple[int, int] | None = None
    i, n = m.end(), len(text)
    while i < n:
        ch = text[i]
        if ch == "(":
            depth_paren += 1
            i += 1
            continue
        if ch == ")":
            depth_paren -= 1
            i += 1
            continue
        wm = _WORD_RE.match(text, i)
        if wm:
            w = wm.group(0).upper()
            if w == "CASE":
                depth_case += 1
            elif w == "END":
                depth_case -= 1
                if depth_case == 0:
                    end_kw = (wm.start(), wm.end())
                    break
            elif depth_case == 1 and depth_paren == 0 and w in ("WHEN", "THEN", "ELSE"):
                markers.append((w, wm.start(), wm.end()))
            i = wm.end()
            continue
        i += 1
    if end_kw is None or not markers:
        # no balanced CASE body here — let Spark report it; still
        # process any CASEs later in the text
        return text[: m.end()] + _rewrite_simple_cases(text[m.end() :])
    operand = text[m.end() : markers[0][1]]
    segs: list[tuple[str, str]] = []
    for k, (w, _s0, e0) in enumerate(markers):
        nxt = markers[k + 1][1] if k + 1 < len(markers) else end_kw[0]
        segs.append((w, text[e0:nxt]))
    pairs: list[tuple[str, str]] = []
    else_text: str | None = None
    ok_shape = True
    k = 0
    while k < len(segs):
        if segs[k][0] == "WHEN" and k + 1 < len(segs) and segs[k + 1][0] == "THEN":
            pairs.append((segs[k][1], segs[k + 1][1]))
            k += 2
        elif segs[k][0] == "ELSE" and k == len(segs) - 1:
            else_text = segs[k][1]
            k += 1
        else:
            ok_shape = False
            break
    # rewrite nested CASEs inside every span FIRST — that hides any
    # nested multi-value comma lists behind `IN (...)` parens, so the
    # top-level comma split below cannot misfire on them
    pairs_r = [
        (_rewrite_simple_cases(w), _rewrite_simple_cases(t)) for w, t in pairs
    ]
    multi = bool(operand.strip()) and any(
        len(_split_top_commas(w)) > 1 for w, _ in pairs_r
    )
    if not ok_shape or not multi:
        return text[: m.end()] + _rewrite_simple_cases(text[m.end() :])
    out = ["CASE"]
    op = _rewrite_simple_cases(operand).strip()
    for wtxt, ttxt in pairs_r:
        vals = ", ".join(v.strip() for v in _split_top_commas(wtxt))
        out.append(f" WHEN ({op}) IN ({vals}) THEN {ttxt.strip()}")
    if else_text is not None:
        out.append(f" ELSE {_rewrite_simple_cases(else_text).strip()}")
    out.append(" END")
    return text[: m.start()] + "".join(out) + _rewrite_simple_cases(text[end_kw[1] :])


_WINDOW_KW_RE = re.compile(r"\bWINDOW\b", re.IGNORECASE)
_WINDOW_DEF_RE = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", re.IGNORECASE)
_AGG_CALL_RE = re.compile(
    r"\b(count|sum|avg|min|max|first|last|product|bool_and|bool_or|array_agg|"
    r"collect_list|collect_set|stddev|stddev_samp|stddev_pop|variance|var_samp|"
    r"var_pop)\s*\(",
    re.IGNORECASE,
)


def _rewrite_window_refs(text: str) -> str:
    """Inline window-name references inside a ``WINDOW`` clause.  SQL-2006
    (and the reference grammar, ``WindowClauseParser``) lets one named
    window extend another — ``WINDOW w0 AS (), w1 AS (w0 ROWS ...)`` —
    which Spark's parser rejects; splicing the base spec's text in front
    is semantically exact because a window spec is purely additive."""
    m = _WINDOW_KW_RE.search(text)
    if m is None:
        return text
    defs: list[tuple[str, int, int]] = []  # (name, spec_start, spec_end)
    pos, n = m.end(), len(text)
    while True:
        dm = _WINDOW_DEF_RE.match(text, pos)
        if not dm:
            break
        open_p = dm.end() - 1
        depth, close = 0, None
        for j in range(open_p, n):
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
                if depth == 0:
                    close = j
                    break
        if close is None:
            return text
        defs.append((dm.group(1), open_p + 1, close))
        cm = re.match(r"\s*,", text[close + 1 :])
        pos = close + 1 + (cm.end() if cm else 0)
        if not cm:
            break
    if not defs:
        return text[: m.end()] + _rewrite_window_refs(text[m.end() :])
    specs: dict[str, str] = {}
    repl: list[tuple[int, int, str]] = []
    for name, s0, s1 in defs:
        spec = text[s0:s1]
        rm = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)", spec)
        if rm and rm.group(1) in specs:
            spec = (specs[rm.group(1)] + " " + spec[rm.end() :].strip()).strip()
        else:
            spec = spec.strip()
        specs[name] = spec
        repl.append((s0, s1, spec))
    out: list[str] = []
    prev = 0
    for s0, s1, spec in repl:
        out.append(text[prev:s0])
        out.append(spec)
        prev = s1
    out.append(_rewrite_window_refs(text[prev:]))
    return "".join(out)


def _rewrite_global_agg_orderby(text: str) -> str:
    """spear resolves an aggregate function appearing (only) in ORDER BY
    into a *global aggregate* — ``SELECT 1 FROM t ORDER BY count(a)``
    returns one row (``aggregationAnalysis.scala:95-110``,
    ``AggregationAnalysisSuite.scala:46-80``; DuckDB/PostgreSQL agree).
    Spark rejects the form outright, but accepts it once the block is
    aggregated — inserting ``HAVING TRUE`` reproduces the exact
    semantics.  Conservative trigger: single query block (no top-level
    set ops), no top-level GROUP BY/HAVING, and a known aggregate call
    (not window ``... OVER``) inside the top-level ORDER BY."""
    depth = 0
    idx_order = None
    has_block_kw = False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth -= 1
            i += 1
            continue
        wm = _WORD_RE.match(text, i)
        if wm:
            if depth == 0:
                w = wm.group(0).upper()
                if w == "ORDER" and re.match(r"\s*BY\b", text[wm.end() :], re.IGNORECASE):
                    idx_order = wm.start()
                elif w in ("GROUP", "HAVING", "UNION", "INTERSECT", "EXCEPT"):
                    has_block_kw = True
            i = wm.end()
            continue
        i += 1
    if idx_order is None or has_block_kw:
        return text
    tail = text[idx_order:]
    for am in _AGG_CALL_RE.finditer(tail):
        depth, j = 0, am.end() - 1
        while j < len(tail):
            if tail[j] == "(":
                depth += 1
            elif tail[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if re.match(r"\s*OVER\b", tail[j + 1 :], re.IGNORECASE):
            continue
        return text[:idx_order] + "HAVING TRUE " + text[idx_order:]
    return text


def _rewrite_row_types(text: str) -> str:
    """``ROW(name TYPE, ...)`` → ``STRUCT<name: TYPE, ...>``.  Unquoted
    field names are upper-cased (the reference's SQL case folding,
    ``DataTypeParserSuite.scala:45-51``); quoted names — placeholders
    at this stage — keep their case.  A parenthesized list that does
    not look like name/type pairs is left untouched."""
    m = _ROW_RE.search(text)
    if m is None:
        return text
    open_p = m.end() - 1
    depth, close = 0, None
    for i in range(open_p, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                close = i
                break
    if close is None:
        return text
    fields: list[str] = []
    ok = True
    for f in _split_top_commas(text[open_p + 1 : close]):
        bits = f.strip().split(None, 1)
        if len(bits) != 2:
            ok = False
            break
        name, typ = bits
        if _PLAIN_NAME_RE.match(name):
            name = name.upper()
        fields.append(f"{name}: {_rewrite_row_types(typ.strip())}")
    if not ok:
        return text[: close + 1] + _rewrite_row_types(text[close + 1 :])
    return (
        text[: m.start()]
        + "STRUCT<"
        + ", ".join(fields)
        + ">"
        + _rewrite_row_types(text[close + 1 :])
    )


_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.IGNORECASE)
_QUALIFY_END_RE = re.compile(
    r"\b(ORDER\s+BY|LIMIT|OFFSET|UNION|INTERSECT|EXCEPT)\b", re.IGNORECASE
)
_LAST_SELECT_RE = re.compile(r"\bSELECT\b", re.IGNORECASE)


def _depth0_spans(text: str):
    """Yield (start, end) character spans that sit at paren depth 0."""
    depth, start = 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            if depth == 0:
                yield (start, i)
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                start = i + 1
    if depth == 0:
        yield (start, len(text))


def _find_depth0(text: str, regex: re.Pattern, from_pos: int = 0) -> int:
    for lo, hi in _depth0_spans(text):
        if hi <= from_pos:
            continue
        m = regex.search(text, max(lo, from_pos), hi)
        if m:
            return m.start()
    return -1


def _rewrite_qualify(text: str) -> str:
    """``QUALIFY <pred>`` (Snowflake/DuckDB-style window filtering; a
    dialect *extension* — the reference grammar has no QUALIFY) → a
    triple wrap Spark accepts::

        SELECT * EXCEPT (__qualify__) FROM (
          SELECT *, (<pred>) AS __qualify__ FROM ( <original select> )
        ) WHERE __qualify__ <tail>

    The inner level materializes the select list (so ``<pred>`` can
    reference select aliases, including window-function aliases), the
    middle level may itself contain window expressions (evaluated over
    the select's output — the documented constraint: QUALIFY windows
    see *selected* columns, not pre-projection ones), and the outer
    level drops the helper column and keeps ORDER BY/LIMIT semantics.

    Only a depth-0 QUALIFY in the outermost query block is rewritten
    (CTE bodies/subqueries sit inside parens); set-operation branches
    with QUALIFY are rejected by Spark downstream, loudly.
    """
    qpos = _find_depth0(text, _QUALIFY_RE)
    if qpos < 0:
        return text
    # owning SELECT = last depth-0 SELECT before the QUALIFY (CTE
    # bodies are parenthesized, so WITH prefixes are skipped naturally)
    sel = -1
    pos = 0
    while True:
        nxt = _find_depth0(text, _LAST_SELECT_RE, pos)
        if nxt < 0 or nxt >= qpos:
            break
        sel, pos = nxt, nxt + 6
    if sel < 0:
        return text
    pend = _find_depth0(text, _QUALIFY_END_RE, qpos + 7)
    if pend < 0:
        pend = len(text)
    body = text[sel:qpos].strip()
    pred = text[qpos + 7 : pend].strip()
    tail = text[pend:]
    return (
        text[:sel]
        + "SELECT * EXCEPT (__qualify__) FROM ("
        + "SELECT *, (" + pred + ") AS __qualify__ FROM (" + body + ")"
        + ") WHERE __qualify__ " + tail
    )


def to_spark_sql(sql: str) -> str:
    """Rewrite a spear-dialect SQL string into Spark SQL."""
    parts = _merge_adjacent_strings(_strip_strings(sql))
    # encode literals/identifiers as placeholders so the structural
    # rewrites below can treat the statement as one string without ever
    # touching quoted content
    subst: list[str] = []
    text_parts: list[str] = []
    for kind, chunk in parts:
        if kind == "code":
            text_parts.append(chunk)
            continue
        if kind == "ident":
            # SQL-2006 delimited identifier → Spark backtick identifier
            inner = chunk[1:-1].replace('""', '"')
            chunk = "`" + inner.replace("`", "``") + "`"
        subst.append(chunk)
        text_parts.append(f"\x01{len(subst) - 1}\x01")
    text = "".join(text_parts)
    # spear '^' is POWER (tighter than * / %, left-assoc) — Spark
    # would read XOR, so rewrite before anything else
    if "^" in text:
        text = _rewrite_power(text)
    # multi-valued simple CASE → searched CASE with IN lists
    text = _rewrite_simple_cases(text)
    # WINDOW w1 AS (w0 ...) inheritance → inline the base spec
    text = _rewrite_window_refs(text)
    # aggregate-only ORDER BY without GROUP BY → global aggregate
    text = _rewrite_global_agg_orderby(text)
    # bare set operators: spear UNION is a bag, INTERSECT/EXCEPT are
    # multiset (basicOperators.scala:61-76) — Spark's bare forms dedup
    text = re.sub(r"\bUNION\b(?!\s+ALL\b)", "UNION ALL", text, flags=re.IGNORECASE)
    text = re.sub(
        r"\bINTERSECT\b(?!\s+ALL\b)", "INTERSECT ALL", text, flags=re.IGNORECASE
    )
    text = re.sub(r"\bEXCEPT\b(?!\s+ALL\b)", "EXCEPT ALL", text, flags=re.IGNORECASE)
    # QUALIFY window filtering (dialect extension) → triple wrap.  Runs
    # AFTER the set-operator pass so the emitted star-EXCEPT projection
    # is not mangled into the multiset EXCEPT ALL.
    text = _rewrite_qualify(text)
    # TIMESTAMP(p)/TIME(p) type precision has no Spark analog — drop
    text = re.sub(
        r"\b(TIMESTAMP|TIME)\s*\(\s*\d+\s*\)", r"\1", text, flags=re.IGNORECASE
    )
    # SQL-2006 ROW(...) type syntax → Spark STRUCT<...>
    text = _rewrite_row_types(text)
    return _PLACEHOLDER_RE.sub(lambda mm: subst[int(mm.group(1))], text)
