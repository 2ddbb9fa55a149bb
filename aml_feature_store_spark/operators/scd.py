"""SCD2 (slowly-changing dimension) history maintenance + as-of reads.

Feature stores need point-in-time-correct entity attributes (risk tier,
KYC status, merchant category) next to the event-derived features; the
PIT join (operators/pit.py) handles the event side, this handles the
dimension side. No Delta in this environment, so MERGE is emulated with
pure DataFrame algebra (join + union) producing a new history snapshot —
semantics identical to a `MERGE INTO` SCD2 template.

History schema: key, tracked attrs..., valid_from_ms, valid_to_ms
(NULL = current row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .pit import latest_snapshot


def _attrs_differ(tracked: list[str], left: str, right: str) -> Column:
    cond = F.lit(False)
    for c in tracked:
        l, r = F.col(f"{left}.{c}"), F.col(f"{right}.{c}")
        cond = cond | ~(l.eqNullSafe(r))
    return cond


def scd2_apply(
    history: DataFrame | None,
    changes: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Fold a change batch into an SCD2 history (returns the new history).

    - new keys → open row (valid_from = change ts)
    - changed attrs → close the current row at the change ts, open a new one
    - unchanged attrs → history untouched
    Multiple changes per key in one batch collapse to the latest (use
    smaller batches to retain intra-batch history). Same-key changes with
    identical timestamps resolve by ``tiebreak_col`` (a change/event id) —
    pass one whenever the change feed can carry intra-ms duplicates, or
    the surviving row would depend on partition order.
    """
    ms = F.unix_millis(F.col(ts_col))
    latest = latest_snapshot(
        changes, key_col, ts_col, tiebreak_col=tiebreak_col or ts_col
    )
    incoming = latest.select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        ms.alias("_chg_ms"),
    )
    if history is None:
        return incoming.select(
            key_col,
            *tracked_cols,
            F.col("_chg_ms").alias("valid_from_ms"),
            F.lit(None).cast("long").alias("valid_to_ms"),
        )

    closed = history.filter(F.col("valid_to_ms").isNotNull())
    current = history.filter(F.col("valid_to_ms").isNull())

    j = current.alias("cur").join(
        incoming.alias("inc"), F.col(f"cur.{key_col}") == F.col(f"inc.{key_col}"), "full"
    )
    differ = _attrs_differ(tracked_cols, "cur", "inc")
    is_new = F.col(f"cur.{key_col}").isNull()
    is_gone = F.col(f"inc.{key_col}").isNull()

    keep_current = j.filter(~is_new & (is_gone | ~differ)).select("cur.*")
    close_old = (
        j.filter(~is_new & ~is_gone & differ)
        .select(
            F.col(f"cur.{key_col}").alias(key_col),
            *[F.col(f"cur.{c}").alias(c) for c in tracked_cols],
            F.col("cur.valid_from_ms").alias("valid_from_ms"),
            F.col("inc._chg_ms").alias("valid_to_ms"),
        )
    )
    open_new = (
        j.filter(is_new | (~is_gone & differ))
        .select(
            F.col(f"inc.{key_col}").alias(key_col),
            *[F.col(f"inc.{c}").alias(c) for c in tracked_cols],
            F.col("inc._chg_ms").alias("valid_from_ms"),
            F.lit(None).cast("long").alias("valid_to_ms"),
        )
    )
    return closed.unionByName(keep_current).unionByName(close_old).unionByName(
        open_new
    )


def scd2_as_of(history: DataFrame, ts_ms: int) -> DataFrame:
    """Dimension rows valid at an instant (the PIT dimension lookup):
    valid_from ≤ t < valid_to."""
    return history.filter(
        (F.col("valid_from_ms") <= ts_ms)
        & (F.col("valid_to_ms").isNull() | (F.col("valid_to_ms") > ts_ms))
    )
