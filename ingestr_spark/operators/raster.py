"""Raster point extraction (SURVEY §2.1 S3) — Spark-first.

The reference loads a NetCDF/GeoTIFF brick with terra and runs
``terra::extract(method="bilinear")`` per site
(R/ingest_globalfields.R:1185-1303). The Spark reformulation treats the
raster as what it is at 100 TB scale: a TABLE of grid cells
``(band, ix, iy, value)`` (one row per cell — how gridded data lands in a
lakehouse), and point extraction as a broadcast equi-join:

1. each point derives its 4 neighbouring cell indices + bilinear weights as
   a pure projection (no data touched),
2. corners explode to 4 rows and equi-join the cell table on (ix, iy) —
   the tiny point side broadcasts, the raster side is never shuffled,
3. the 4 corner values fold back per point with conditional aggregation
   (exact — integer cell values), and the weighted sum is ONE fixed-order
   float expression, so the result is bit-identical on any engine or
   partitioning (a bare SUM over the 4 joined rows would be
   order-dependent).

Points whose NONZERO-weight corners miss the grid yield NULL, like terra's
NA; zero-weight off-grid corners (a point exactly on the last cell-center
row/column) fold in as 0, so the outer half-cell ring reads correctly.
The reference's ``get_time`` wide→long unpivot is the existing R1 operator
(operators/reshape.py::unpivot) applied to multi-band output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridGeoref:
    """Regular grid georeferencing: cell CENTER (ix, iy) sits at
    (x0 + ix*dx, y0 + iy*dy); valid indices 0..nx-1 / 0..ny-1."""
    x0: float
    y0: float
    dx: float
    dy: float
    nx: int
    ny: int


def synth_raster(spark, georef: GridGeoref, bands: int = 1) -> DataFrame:
    """Deterministic synthetic raster table: cell (band, ix, iy) holds the
    integer value (band*7 + ix*13 + iy*17) % 1000 — pure int arithmetic,
    reproduced exactly by the DuckDB oracle."""
    return (
        spark.range(bands * georef.nx * georef.ny)
        .select(
            (F.col("id") % bands).cast("int").alias("band"),
            (F.expr(f"id div {bands}") % georef.nx).cast("int").alias("ix"),
            (F.expr(f"id div {bands * georef.nx}")).cast("int").alias("iy"),
        )
        .withColumn(
            "value",
            ((F.col("band") * 7 + F.col("ix") * 13 + F.col("iy") * 17) % 1000)
            .cast("long"),
        )
    )


def extract_points_bilinear(
    points: DataFrame,
    grid: DataFrame,
    georef: GridGeoref,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bands: list[int] | None = None,
) -> DataFrame:
    """Bilinear extraction of every point against every band of ``grid``.

    Output: point columns + (band, value) with
    value = v00*(1-fx)*(1-fy) + v10*fx*(1-fy) + v01*(1-fx)*fy + v11*fx*fy
    evaluated in exactly that operand order (mirrored by the DuckDB oracle).
    NULL when any NONZERO-weight corner falls outside the grid."""
    fx_raw = (F.col(lon_col) - F.lit(georef.x0)) / F.lit(georef.dx)
    fy_raw = (F.col(lat_col) - F.lit(georef.y0)) / F.lit(georef.dy)
    p = points.withColumn("_ix0", F.floor(fx_raw).cast("int")).withColumn(
        "_iy0", F.floor(fy_raw).cast("int")
    ).withColumn("_fx", fx_raw - F.col("_ix0")).withColumn(
        "_fy", fy_raw - F.col("_iy0")
    )
    # 4 corner rows per point: corner c in {0,1,2,3} = (dx_bit, dy_bit)
    corners = p.select(
        "*",
        F.explode(F.array(*[F.lit(c) for c in range(4)])).alias("_c"),
    ).withColumn("ix", (F.col("_ix0") + F.col("_c") % 2).cast("int")).withColumn(
        "iy", (F.col("_iy0") + F.expr("_c div 2")).cast("int")
    )
    joined = F.broadcast(corners).join(grid, ["ix", "iy"], "inner")
    point_cols = points.columns
    gathered = joined.groupBy(*point_cols, "_fx", "_fy", "band").agg(
        # corner-count integrity (ADVICE r4): with a well-formed grid each
        # (band, ix, iy) matches a corner at most once; a duplicated grid
        # cell is surfaced via raise_error below instead of being silently
        # resolved by max(). r7: detected as "any PER-CORNER match count
        # > 1" via four conditional counts — equivalent to the old
        # rowcount-vs-countDistinct comparison, but without the
        # distinct-aggregate Expand (which doubled the aggregation phases
        # and added an exchange per extraction pipeline).
        *[
            F.sum(F.when(F.col("_c") == c, 1).otherwise(0)).alias(f"_n{c}")
            for c in range(4)
        ],
        *[
            F.max(F.when(F.col("_c") == c, F.col("value"))).alias(f"_v{c}")
            for c in range(4)
        ],
    )
    fx, fy = F.col("_fx"), F.col("_fy")
    weights = [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy]
    # a missing corner only invalidates the point when its weight is
    # NONZERO: a point exactly on the last cell-center row/column (fx or fy
    # == 0 at the grid edge) has well-defined bilinear value even though
    # the off-grid corners "participate" with weight 0 — terra::extract
    # returns data there, so must we (missing zero-weight corners fold in
    # as 0, which cannot change the fixed-order sum)
    valid = F.lit(True)
    for c, w_c in enumerate(weights):
        valid = valid & (F.col(f"_v{c}").isNotNull() | (w_c == 0))
    v = [F.coalesce(F.col(f"_v{c}"), F.lit(0)) for c in range(4)]
    val = (
        v[0] * (1 - fx) * (1 - fy)
        + v[1] * fx * (1 - fy)
        + v[2] * (1 - fx) * fy
        + v[3] * fx * fy
    )
    dup = (
        (F.col("_n0") > 1) | (F.col("_n1") > 1)
        | (F.col("_n2") > 1) | (F.col("_n3") > 1)
    )
    extracted = gathered.select(
        *point_cols,
        "band",
        F.when(
            dup,
            F.raise_error(F.lit(
                "corrupt raster grid: duplicate (band, ix, iy) cell rows "
                "matched a point corner more than once"
            )),
        ).otherwise(F.when(valid, val)).alias("value"),
    )
    # re-attach points whose every corner missed the grid (the inner join
    # dropped them): left-join the small point×band universe back — keeps
    # the big raster side inner/broadcast-joined, and fully-outside points
    # come back as NULL rows, matching terra's NA. Pass ``bands`` on large
    # grids — deriving it with distinct() costs a full raster scan.
    if bands is not None:
        spark = points.sparkSession
        band_df = spark.createDataFrame([(int(b),) for b in bands], "band int")
    else:
        band_df = grid.select("band").distinct()
    universe = points.crossJoin(band_df)
    return universe.join(extracted, [*point_cols, "band"], "left")
