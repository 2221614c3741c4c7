"""Exact distributed quantiles for bounded-domain integer metrics.

Spark's built-in ``percentile_approx`` is a sketch — fine for dashboards,
wrong for a correctness-gated engine. For the metrics this engine actually
summarizes (per-sequence token counts, QC codes, small-int event payloads)
the value DOMAIN is bounded (n_tok ≤ a few thousand distinct values), so
exact quantiles are computable at ANY row scale with the counting method:

1. ``groupBy(key, value).count()`` — the only row-scale shuffle, with full
   map-side combine (output cardinality = keys × distinct values, NOT rows);
2. a cumulative-count window per key ordered by value — partitions are
   bounded by the value domain, never by row count (no hot-key hazard);
3. quantile q = the smallest value whose cumulative count reaches
   ``ceil(q * n)`` (the classic "type-1"/lower discrete quantile — a real
   observed value, no interpolation), selected per (key, q) with a small
   exploded quantile dimension.

Every step is integer arithmetic except the one ``ceil(q * n)`` threshold,
whose operand order the DuckDB oracle mirrors exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    weight_col: str | None = None,
) -> DataFrame:
    """Exact type-1 (lower discrete) quantiles of ``value_col`` per key.

    Output: key_cols + (q double, quantile <value type>, n long). Safe at
    10^12 rows when the value domain is bounded: the window runs over the
    (key, distinct-value) table.

    ``weight_col`` (integer weights, e.g. a tier's ``n_seq``) switches the
    per-value count to a weight SUM — the quantile of the EXPANDED
    population in which each row occurs weight times, without expanding
    anything (how a rolled-up tier answers population quantiles for
    metrics its grouping preserved)."""
    w_agg = (
        F.count(F.lit(1)) if weight_col is None
        else F.sum(weight_col).cast("long")
    )
    counts = df.groupBy(*key_cols, F.col(value_col).alias("_v")).agg(
        w_agg.alias("_c")
    )
    w = Window.partitionBy(*key_cols).orderBy("_v")
    cum = counts.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(Window.partitionBy(*key_cols))
    )
    qdim = F.array(*[F.lit(float(q)) for q in qs])
    exploded = cum.select(
        *key_cols, "_v", "_cum", "_n", F.explode(qdim).alias("q")
    )
    # smallest value whose cumulative count reaches ceil(q * n)
    hit = exploded.filter(
        F.col("_cum") >= F.ceil(F.col("q") * F.col("_n").cast("double"))
    )
    return hit.groupBy(*key_cols, "q").agg(
        F.min("_v").alias("quantile"), F.max("_n").alias("n")
    )
