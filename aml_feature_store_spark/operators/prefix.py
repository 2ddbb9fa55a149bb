"""Scale-safe global prefix sums (two-pass parallel scan).

``Window.orderBy(...)`` with no ``partitionBy`` moves the whole relation to
ONE partition — Spark even warns about it. Fine when the windowed relation
is provably tiny, a named scale-killer when its cardinality is unbounded
(a continuous score column at 100 TB). This module provides the classic
distributed alternative:

1. bucket rows by range over the order key (boundaries from one
   ``percentile_approx`` pass — balance only; correctness never depends on
   where the cuts land, because the sums are exact integers either way);
2. per-bucket window cumsum — partitioned, parallel;
3. per-bucket totals (B rows, driver-collected — bounded by the bucket
   count, not the data) turned into broadcast exclusive offsets;
4. global cumsum = in-bucket cumsum + bucket offset.

Ties by the order key always share a bucket (bucket id = count of
boundaries strictly below the key), so per-bucket ordering is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    buckets: int = 32,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Add inclusive global-prefix-sum columns ``cum_<c>`` and grand-total
    columns ``tot_<c>`` for each c in sum_cols, ordered by ``order_col``
    (then ``tiebreakers``), without any single-partition window.

    ``order_col`` values need not be distinct, but rows with equal keys are
    peers only bucket-wise, not frame-wise — callers that need RANGE-frame
    peer semantics should pre-aggregate to distinct keys first, or pass
    ``tiebreakers`` making the composite ordering total (equal order-key
    rows always share a bucket, so tiebreak ordering stays bucket-local).
    """
    qs = [i / buckets for i in range(1, buckets)]
    row = df.select(
        F.percentile_approx(order_col, qs, 10_000).alias("qs")
    ).first()
    bounds = sorted(set(row["qs"] or []))
    if bounds:
        arr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(b < F.col(order_col), 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("_b", bucket)

    wb = (
        Window.partitionBy("_b")
        .orderBy(order_col, *(tiebreakers or []))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bucketed.select(
        "*", *[F.sum(c).over(wb).alias(f"cum_{c}") for c in sum_cols]
    )

    totals = (
        bucketed.groupBy("_b")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
        .collect()
    )  # bounded: one row per bucket
    if not totals:
        # empty input: zero rows out, but with the full output schema
        # (createDataFrame([]) below can't infer one from an empty list)
        out = cum
        for c in sum_cols:
            out = out.withColumn(
                f"tot_{c}", F.lit(None).cast(out.schema[f"cum_{c}"].dataType)
            )
        return out.drop("_b")
    totals.sort(key=lambda r: r["_b"])
    grand = {c: sum(r[c] or 0 for r in totals) for c in sum_cols}
    # per-column offset dtype must be CONSISTENT across rows: a fractional
    # sum column starts its running offset at 0.0, not int 0, or
    # createDataFrame sees LongType row 0 / DoubleType row 1 and fails
    is_frac = {
        c: any(isinstance(r[c], float) for r in totals) for c in sum_cols
    }
    offsets = []
    running = {c: (0.0 if is_frac[c] else 0) for c in sum_cols}
    for r in totals:
        offsets.append((r["_b"], *[running[c] for c in sum_cols]))
        for c in sum_cols:
            running[c] += r[c] or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets, ["_b", *[f"off_{c}" for c in sum_cols]]
    )
    out = cum.join(F.broadcast(off_df), "_b")
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"cum_{c}") + F.col(f"off_{c}")
        ).withColumn(f"tot_{c}", F.lit(grand[c]))
    return out.drop("_b", *[f"off_{c}" for c in sum_cols])
