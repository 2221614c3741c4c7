"""As-of join — a time-series primitive Spark lacks natively.

Not in the reference (SURVEY §2.4: "No theta/range/interval/as-of joins");
added because attaching the latest rolled-up state to raw events is a core
time-series engine capability (and the DuckDB oracle has a native ASOF JOIN
to check us against).

Two implementations:

* :func:`asof_join` — pure DataFrame composition: tag both sides, union,
  ONE window pass per key ordered by (ts, side) with last(ignorenulls)
  carrying the right side's values forward onto left rows. Cost = one
  shuffle + one sort over |L|+|R| — the scalable path (a naive range join
  would be |L|×|R| per key; merge-asof per group would pin hot keys to one
  task... which the union-window ALSO does per key, but sorting is
  spillable and the carried state is O(1)).
* :func:`asof_join_pandas` — applyInPandas ``pd.merge_asof`` per key, for
  parity testing and when tolerance semantics beyond the simple cutoff are
  needed.

Backward direction, inclusive (right.ts <= left.ts), optional tolerance.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row's ``value_cols``
    with right_ts <= left_ts (per key). Right wins ties (inclusive)."""
    axis_l = F.col(left_ts).cast("timestamp").cast("long")
    axis_r = F.col(right_ts).cast("timestamp").cast("long")
    l = left.withColumn("_t", axis_l).withColumn("_side", F.lit(1))
    for c in value_cols:
        l = l.withColumn(f"_v_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        *key_cols,
        axis_r.alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    left_cols = [c for c in left.columns]
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.select(*left_cols, "_t", "_side", *[f"_v_{c}" for c in value_cols]).unionByName(
        r.select(*left_cols, "_t", "_side", *[f"_v_{c}" for c in value_cols])
    )
    # right rows (side 0) sort before left rows at equal ts -> inclusive
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u
    for c in value_cols:
        out = out.withColumn(f"_v_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        rt = F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w)
        stale = (F.col("_t") - rt) > tolerance_seconds
        for c in value_cols:
            out = out.withColumn(f"_v_{c}", F.when(stale, None).otherwise(F.col(f"_v_{c}")))
    out = out.filter(F.col("_side") == 1).drop("_t", "_side")
    for c in value_cols:
        out = out.withColumnRenamed(f"_v_{c}", c)
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """merge_asof per key via cogrouped applyInPandas (parity/testing path)."""
    # DDL string, not StructType: mutating a df's cached schema object via
    # .add() confuses Spark 4 analysis of the cogroup output
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`{c}` {right.schema[c].dataType.simpleString()}" for c in value_cols]
    )

    tol = pd.Timedelta(seconds=tolerance_seconds) if tolerance_seconds else None

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts)
        if rpdf.empty:
            for c in value_cols:
                lpdf[c] = None
            return lpdf
        rpdf = rpdf.sort_values(right_ts)[[right_ts, *value_cols]]
        merged = pd.merge_asof(
            lpdf, rpdf, left_on=left_ts, right_on=right_ts,
            direction="backward", tolerance=tol,
        )
        return merged[[*lpdf.columns.drop(value_cols, errors="ignore"), *value_cols]]

    return (
        left.groupBy(*key_cols)
        .cogroup(right.groupBy(*key_cols))
        .applyInPandas(merge, out_schema)
    )
