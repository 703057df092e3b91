"""Skew-handling join helpers.

AQE's skew-join splitting (enabled in ``context.DEFAULT_CONF``) handles
most skew at runtime by splitting oversized partitions.  Salting is the
explicit fallback for the pathological case AQE can't fix: a single hot
key whose *build side* row set doesn't fit one task — e.g. one user with
10⁹ events joined against a per-user dimension.

:func:`salted_join` replicates the small side R times and splits the big
side's hot keys across R salt buckets: the hot key's work spreads over R
tasks at the cost of R× the (small) right side's shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: ``big`` rows get a random salt in
    [0, salt); ``small`` is exploded to all salts.  Semantically
    identical to ``big.join(small, on, how)`` for inner/left joins."""
    big_s = big.withColumn("_salt", (F.rand(seed=0) * salt).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
