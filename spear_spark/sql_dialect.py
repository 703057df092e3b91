"""spear SQL dialect shim (SURVEY §7 phase 2).

Spark SQL is a strict superset of spear's SQL-2006 subset except for
three grammar-level deltas.  The policy per delta:

* bare ``UNION`` — spear parses it as **bag** union
  (``QueryExpressionParser.scala:364-381``); Spark/ANSI dedup.
  Rewritten here to ``UNION ALL`` (token-level, string-literal-safe).
* ``^`` — spear parses power (``ValueExpressionParser.scala``); Spark
  parses bitwise XOR.  Silent rewriting of an infix operator inside
  arbitrary expressions is precedence-fragile, so spear-dialect queries
  containing ``^`` are **rejected** with guidance to use ``power()``
  (available in both dialects) — loud divergence beats silent wrongness.
* ``TIME(p)`` / ``TIMESTAMP(p)`` type precision — spear-only; the
  precision parameter has no Spark analog (SURVEY §1.2) and is dropped
  by the same token pass.
"""

from __future__ import annotations

import re


def _strip_strings(sql: str) -> list[tuple[bool, str]]:
    """Split into (is_literal, chunk) segments so rewrites never touch
    quoted strings."""
    parts: list[tuple[bool, str]] = []
    i, n = 0, len(sql)
    buf = []
    while i < n:
        c = sql[i]
        if c == "'":
            parts.append((False, "".join(buf)))
            buf = []
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            parts.append((True, sql[i : j + 1]))
            i = j + 1
        else:
            buf.append(c)
            i += 1
    parts.append((False, "".join(buf)))
    return parts


def to_spark_sql(sql: str) -> str:
    """Rewrite a spear-dialect SQL string into Spark SQL."""
    out = []
    for is_lit, chunk in _strip_strings(sql):
        if is_lit:
            out.append(chunk)
            continue
        if "^" in chunk:
            raise ValueError(
                "spear-dialect '^' (power) is bitwise XOR in Spark SQL; "
                "use power(a, b) instead"
            )
        # bare UNION → UNION ALL (spear UNION is a bag); leave existing
        # UNION ALL and UNION DISTINCT? (not in spear grammar) intact
        chunk = re.sub(
            r"\bUNION\b(?!\s+ALL\b)", "UNION ALL", chunk, flags=re.IGNORECASE
        )
        # TIMESTAMP(p)/TIME(p) type precision has no Spark analog — drop
        chunk = re.sub(r"\bTIMESTAMP\s*\(\s*\d\s*\)", "TIMESTAMP", chunk, flags=re.IGNORECASE)
        out.append(chunk)
    return "".join(out)
