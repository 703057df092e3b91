"""spear SQL dialect shim (SURVEY §7 phase 2).

Spark SQL is a strict superset of spear's SQL-2006 subset except for
four grammar-level deltas.  The policy per delta:

* bare ``UNION`` — spear parses it as **bag** union
  (``QueryExpressionParser.scala:364-381``); Spark/ANSI dedup.
  Rewritten here to ``UNION ALL`` (token-level, string-literal-safe).
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


def _strip_strings(sql: str) -> list[tuple[str, str]]:
    """Split into (kind, chunk) segments where kind is ``code``,
    ``str`` (single-quoted literal, '' escapes) or ``ident``
    (double-quoted identifier, "" escapes) so rewrites never touch
    quoted content."""
    parts: list[tuple[str, str]] = []
    i, n = 0, len(sql)
    buf: list[str] = []
    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            parts.append(("code", "".join(buf)))
            buf = []
            j = i + 1
            while j < n:
                if sql[j] == c and j + 1 < n and sql[j + 1] == c:
                    j += 2
                    continue
                if sql[j] == c:
                    break
                j += 1
            parts.append(("str" if c == "'" else "ident", sql[i : j + 1]))
            i = j + 1
        else:
            buf.append(c)
            i += 1
    parts.append(("code", "".join(buf)))
    return parts


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


def to_spark_sql(sql: str) -> str:
    """Rewrite a spear-dialect SQL string into Spark SQL."""
    out = []
    for kind, chunk in _strip_strings(sql):
        if kind == "str":
            out.append(chunk)
            continue
        if kind == "ident":
            # SQL-2006 delimited identifier → Spark backtick identifier
            inner = chunk[1:-1].replace('""', '"')
            out.append("`" + inner.replace("`", "``") + "`")
            continue
        # spear '^' is POWER (tighter than * / %, left-assoc) — Spark
        # would read XOR, so rewrite before anything else
        if "^" in chunk:
            chunk = _rewrite_power(chunk)
        # bare UNION → UNION ALL (spear UNION is a bag); leave existing
        # UNION ALL intact
        chunk = re.sub(
            r"\bUNION\b(?!\s+ALL\b)", "UNION ALL", chunk, flags=re.IGNORECASE
        )
        # TIMESTAMP(p)/TIME(p) type precision has no Spark analog — drop
        chunk = re.sub(
            r"\b(TIMESTAMP|TIME)\s*\(\s*\d+\s*\)", r"\1", chunk, flags=re.IGNORECASE
        )
        out.append(chunk)
    return "".join(out)
