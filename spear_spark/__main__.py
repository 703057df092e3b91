"""REPL entry point — the reference's third entry point
(``spear-repl/src/main/scala/spear/repl/Main.scala`` boots Ammonite with
an implicit Context; ``python -m spear_spark`` boots a Python REPL with
a ready ``ctx``).

Usage::

    python -m spear_spark
    >>> ctx.sql("SELECT 1 + 1 AS two").show()
"""

from __future__ import annotations


def main() -> None:
    import code

    from spear_spark import Context, functions  # noqa: F401
    from spear_spark.windows import Window  # noqa: F401

    ctx = Context()
    banner = (
        f"spear-on-spark REPL (Spark {ctx.spark.version})\n"
        "bindings: ctx (Context), spark (SparkSession), F (spear_spark.functions), Window"
    )
    code.interact(
        banner=banner,
        local={"ctx": ctx, "spark": ctx.spark, "F": functions, "Window": Window},
    )


if __name__ == "__main__":
    main()
