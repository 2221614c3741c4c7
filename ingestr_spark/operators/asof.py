"""As-of join and 1-D nearest-key join — time-series primitives Spark lacks.

Not in the reference (SURVEY §2.4: "No theta/range/interval/as-of joins");
added because attaching the latest rolled-up state to raw events is a core
time-series engine capability (and the DuckDB oracle has a native ASOF JOIN
to check us against). :func:`nearest_join` is the 1-D, non-geometric essence
of the reference's nearest-neighbor fallback (R/ingest.R:252-309
find_closest: pick the closest available key when the exact key is missing).

Scale design — the CHUNKED union-window (default):

A single window partitioned by the bare key pins every row of a hot key to
one task (the ``hot`` source holds ~50% of all rows in the fixture; PERF.md's
rule is "window/grouped stages key by (source, chunk), never bare (source)").
Instead both sides are bucketed by (key, time-chunk) and the carried state —
the last right row from any earlier chunk — is computed on a per-(key, chunk)
SUMMARY table (one row per key × chunk, bounded by the calendar, not the data)
and injected into each chunk as a seed row. The main window then partitions
by (key, chunk): max task size = one chunk of one key. This is the same
chunk-edge trick SURVEY §7.3-7 prescribes for LOCF over tiers.

Passing ``chunk_seconds=None`` selects the single-window path (fine when the
input is already a bounded tier, e.g. ≤ a few thousand rows per key).

Backward direction, inclusive (right.ts <= left.ts), optional tolerance.
Ties on right_ts within a key are resolved arbitrarily (same caveat as any
engine's ASOF when the right side is not unique per timestamp).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CHUNK_SECONDS = 30 * 86400  # one calendar-ish month per task


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
    chunk_seconds: int | None = DEFAULT_CHUNK_SECONDS,
    direction: str = "backward",
    keep_right_ts: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row's ``value_cols``
    with right_ts <= left_ts (per key; ``direction="forward"`` flips to the
    earliest right row with right_ts >= left_ts). Right wins ties (inclusive).

    ``keep_right_ts`` additionally emits the matched right row's epoch
    seconds under that column name (used by :func:`nearest_join`).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    sign = 1 if direction == "backward" else -1
    axis_l = F.col(left_ts).cast("timestamp").cast("long") * sign
    axis_r = F.col(right_ts).cast("timestamp").cast("long") * sign

    l = left.withColumn("_t", axis_l).withColumn("_side", F.lit(1))
    for c in value_cols:
        l = l.withColumn(f"_v_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        *key_cols,
        axis_r.alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    left_cols = list(left.columns)
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    carry_cols = ["_t", "_side", *[f"_v_{c}" for c in value_cols]]
    l = l.select(*left_cols, *carry_cols)
    r = r.select(*left_cols, *carry_cols)

    if chunk_seconds is None:
        u = l.unionByName(r)
        part_cols = list(key_cols)
    else:
        cs = int(chunk_seconds)
        chunk = F.floor(F.col("_t") / cs).cast("long")
        l = l.withColumn("_chunk", chunk)
        r = r.withColumn("_chunk", chunk)
        # per-(key, chunk) last right row: the candidate carried state
        rsum = r.groupBy(*key_cols, "_chunk").agg(
            F.max_by(
                F.struct(F.col("_t").alias("_rt"),
                         *[F.col(f"_v_{c}").alias(f"_v_{c}") for c in value_cols]),
                F.col("_t"),
            ).alias("_s")
        )
        # which right row is live at the START of each left chunk: window over
        # the SUMMARY rows (one per key×chunk — bounded by the calendar, so a
        # bare-key window here is safe at any data scale). A right summary for
        # chunk c becomes visible from chunk c+1 on (same-chunk right rows are
        # already inside the chunk's own partition).
        lchunks = l.select(*key_cols, "_chunk").distinct()
        ev = rsum.select(
            *key_cols, (F.col("_chunk") + 1).alias("_ce"), F.lit(0).alias("_es"),
            F.col("_s"),
        ).unionByName(
            lchunks.select(
                *key_cols, F.col("_chunk").alias("_ce"), F.lit(1).alias("_es"),
                F.lit(None).cast(rsum.schema["_s"].dataType).alias("_s"),
            )
        )
        wseed = (
            Window.partitionBy(*key_cols)
            .orderBy("_ce", "_es")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        seeds = (
            ev.withColumn("_carry", F.last("_s", ignorenulls=True).over(wseed))
            .filter((F.col("_es") == 1) & F.col("_carry").isNotNull())
            .select(
                *key_cols,
                F.col("_ce").alias("_chunk"),
                F.col("_carry._rt").alias("_t"),
                F.lit(0).alias("_side"),
                *[F.col(f"_carry._v_{c}").alias(f"_v_{c}") for c in value_cols],
            )
        )
        for c in left_cols:
            if c not in seeds.columns:
                seeds = seeds.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
        u = l.unionByName(r).unionByName(
            seeds.select(*left_cols, *carry_cols, "_chunk")
        )
        part_cols = [*key_cols, "_chunk"]

    # right rows (side 0) sort before left rows at equal ts -> inclusive
    w = (
        Window.partitionBy(*part_cols)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u
    for c in value_cols:
        out = out.withColumn(f"_v_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w))
    rt = F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w)
    if tolerance_seconds is not None or keep_right_ts is not None:
        out = out.withColumn("_rt_matched", rt)
    if tolerance_seconds is not None:
        stale = (F.col("_t") - F.col("_rt_matched")) > tolerance_seconds
        for c in value_cols:
            out = out.withColumn(f"_v_{c}", F.when(stale, None).otherwise(F.col(f"_v_{c}")))
        out = out.withColumn(
            "_rt_matched", F.when(stale, None).otherwise(F.col("_rt_matched"))
        )
    out = out.filter(F.col("_side") == 1).drop("_side")
    if chunk_seconds is not None:
        out = out.drop("_chunk")
    if keep_right_ts is not None:
        out = out.withColumn(keep_right_ts, F.col("_rt_matched") * sign)
    out = out.drop("_t", "_rt_matched")
    for c in value_cols:
        out = out.withColumnRenamed(f"_v_{c}", c)
    return out


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
    chunk_seconds: int | None = DEFAULT_CHUNK_SECONDS,
) -> DataFrame:
    """1-D nearest-key join: attach the right row whose ``right_ts`` is
    CLOSEST to ``left_ts`` in either direction (per key); ties go to the
    EARLIER right row. The non-geometric analog of the reference's
    find_closest fallback (R/ingest.R:252-309). Composition of a backward
    and a forward as-of pass — both chunked, so it inherits the (key, chunk)
    partitioning bound."""
    tagged = left.withColumn("_lt", F.col(left_ts).cast("timestamp").cast("long"))
    p = asof_join(
        tagged, right, key_cols, left_ts, right_ts, value_cols,
        tolerance_seconds, chunk_seconds, "backward", keep_right_ts="_pt",
    )
    for c in value_cols:
        p = p.withColumnRenamed(c, f"_p_{c}")
    n = asof_join(
        p, right, key_cols, left_ts, right_ts, value_cols,
        tolerance_seconds, chunk_seconds, "forward", keep_right_ts="_nt",
    )
    for c in value_cols:
        n = n.withColumnRenamed(c, f"_n_{c}")
    big = F.lit(2**62)
    dp = F.coalesce(F.col("_lt") - F.col("_pt"), big)
    dn = F.coalesce(F.col("_nt") - F.col("_lt"), big)
    use_next = dn < dp  # strict: tie -> backward (earlier right row)
    out = n
    for c in value_cols:
        out = out.withColumn(
            c,
            F.when(use_next, F.col(f"_n_{c}")).otherwise(F.col(f"_p_{c}")),
        ).drop(f"_p_{c}", f"_n_{c}")
    out = out.withColumn(
        "nearest_dist",
        F.when(F.least(dp, dn) == big, None).otherwise(F.least(dp, dn)),
    )
    return out.drop("_lt", "_pt", "_nt")


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
