"""Reshaping / set operations (SURVEY §2.9 R1-R7).

* unpivot_longer — pivot_longer (R/ingest.R:363-368; worldclim
  R/ingest.R:1018-1033) via Spark's native ``unpivot`` (melt).
* pivot_wider — band rows → columns (R/ingest_modis_bysite.R:286-292) via
  ``groupBy().pivot().agg(first())``; pass ``values`` to skip the extra
  distinct-scan job.
* expand_grid — months × years grid (R/ingest_globalfields.R:695-699): cross
  join of two sequence-explodes, fully distributed.
* dedup_by_priority — long→wide duplicate resolution keeping the
  highest-priority row per key (R/long_to_wide_fluxnet2015.R:1-375) via a
  row_number window.
* union_with_id — bind_rows(.id=...) (R/ingest.R:179-180): unionByName with
  a literal id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def unpivot_longer(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    name_col: str = "name",
    value_col: str = "value",
) -> DataFrame:
    return df.unpivot(id_cols, value_cols, name_col, value_col)


def pivot_wider(
    df: DataFrame,
    key_cols: list[str],
    name_col: str,
    value_col: str,
    values: list[str] | None = None,
) -> DataFrame:
    g = df.groupBy(*key_cols)
    p = g.pivot(name_col, values) if values else g.pivot(name_col)
    return p.agg(F.first(value_col))


def expand_grid(
    spark: SparkSession, years: tuple[int, int], months: tuple[int, int] = (1, 12)
) -> DataFrame:
    ys = spark.range(1).select(
        F.explode(F.sequence(F.lit(years[0]), F.lit(years[1]))).alias("year")
    )
    ms = spark.range(1).select(
        F.explode(F.sequence(F.lit(months[0]), F.lit(months[1]))).alias("moy")
    )
    return ys.crossJoin(ms)


def dedup_by_priority(
    df: DataFrame,
    key_cols: list[str],
    priority_col: str,
    ascending: bool = False,
) -> DataFrame:
    """Keep one row per key: highest (default) priority wins; ties broken by
    the full ordering of remaining columns via the priority column only —
    callers add tiebreakers to ``priority_col`` ordering if needed."""
    order = F.col(priority_col).asc() if ascending else F.col(priority_col).desc()
    return top_k_per_key(df, key_cols, [order], k=1).drop("rank")


def top_k_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_by: list,
    k: int,
    rank_col: str = "rank",
    sub=None,
) -> DataFrame:
    """Exact top-k rows per key in TWO window phases so no task ever holds a
    whole hot key:

    1. partial top-k per (key, sub-bucket) — ``sub`` defaults to the input
       partition id, so the first exchange hashes on (key, sub) and a hot
       key spreads over as many tasks as it has input splits;
    2. final top-k over the survivors only (≤ k × n_buckets rows per key).

    The union of per-bucket top-k always contains the global top-k, so with a
    TOTAL ``order_by`` (callers must tie-break, e.g. by a unique id) the
    result is exactly the single-window answer — equivalence-tested. Adds
    ``rank_col`` (1..k)."""
    sub = F.spark_partition_id() if sub is None else sub
    w1 = Window.partitionBy(*key_cols, "_sub").orderBy(*order_by)
    cand = (
        df.withColumn("_sub", sub)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_sub", "_r1")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_by)
    return cand.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )


def union_with_id(frames: dict[str, DataFrame], id_col: str = "sitename") -> DataFrame:
    out = None
    for key, df in frames.items():
        tagged = df.withColumn(id_col, F.lit(key))
        out = tagged if out is None else out.unionByName(tagged)
    return out
