"""Changelog compaction (CDC "latest wins" merge) — reduce an ordered
upsert/delete event stream to the current state per key.

The reference is batch-relational only (SURVEY §2.7); this is the
ingestion-side extension every warehouse/lakehouse pipeline needs:
given a changelog of (key, change-ts, op, payload) rows, produce one
row per live key carrying the payload of its latest change, dropping
keys whose latest change is a delete.

Scale shape — aggregation, not window: the textbook formulation is
``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts DESC) = 1``, which
shuffles every change row and sorts each key group.  ``max_by(payload,
order_key)`` computes the same answer as ONE two-phase aggregate: each
map task keeps a single running (order_key, payload) pair per key, so
the exchange carries one row per key per input partition instead of
the full change history — at 100 TB of changelog with hot keys this is
the difference between a skew-prone sort and a partial-agg collapse.
Delete handling stays inside the same aggregate (filter after), so the
whole operator is one shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_latest_state(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str],
    delete_expr=None,
    keep_tombstones: bool = False,
) -> DataFrame:
    """Compact a changelog to current state.

    ``order_cols`` must be a deterministic total order within each key
    (e.g. ``("ts", "change_id")``); ``delete_expr`` is a boolean Column
    evaluated on the *latest* change row — when true the key is dropped
    from the state (tombstone).  Output: key columns + order columns of
    the winning change + payload columns.

    ``keep_tombstones=True`` keeps deleted keys as rows with a
    ``_tombstone`` flag instead of filtering them — required when the
    result is merged against OLDER state (streaming micro-batches): the
    delete must survive compaction to cancel a key the previous state
    still carries.
    """
    ordk = F.struct(*[F.col(c) for c in order_cols])
    carried = F.struct(
        *[F.col(c) for c in order_cols],
        *[F.col(c) for c in payload_cols],
        (delete_expr if delete_expr is not None else F.lit(False))
        .cast("boolean")
        .alias("_tombstone"),
    )
    latest = changes.groupBy(*key_cols).agg(
        F.max_by(carried, ordk).alias("_last")
    )
    out_cols = [
        *key_cols,
        *[F.col("_last")[c].alias(c) for c in order_cols],
        *[F.col("_last")[c].alias(c) for c in payload_cols],
    ]
    if keep_tombstones:
        return latest.select(*out_cols, F.col("_last")["_tombstone"].alias("_tombstone"))
    return latest.filter(~F.col("_last")["_tombstone"]).select(*out_cols)
