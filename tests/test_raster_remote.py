"""S3 raster bilinear extraction + S9 retry source + S10 subprocess source
(the three SURVEY §2.1 entries that were declared n/a through round 3)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

from ingestr_spark.operators.raster import (
    GridGeoref,
    extract_points_bilinear,
    synth_raster,
)
from ingestr_spark.sources.remote import (
    RetryExhausted,
    fetch_with_retry,
    run_subprocess_source,
)

GEOREF = GridGeoref(0.25, 0.25, 0.5, 0.5, 10, 8)


def _cell(band, ix, iy):
    return (band * 7 + ix * 13 + iy * 17) % 1000


def test_bilinear_exact_center_and_midpoint(spark):
    grid = synth_raster(spark, GEOREF, bands=1)
    pts = spark.createDataFrame(
        [
            ("center", 0.25 + 3 * 0.5, 0.25 + 2 * 0.5),   # exactly cell (3,2)
            ("midx", 0.25 + 3.5 * 0.5, 0.25 + 2 * 0.5),   # halfway to (4,2)
            ("quarter", 0.25 + 3.25 * 0.5, 0.25 + 2.5 * 0.5),
        ],
        "sitename string, lon double, lat double",
    )
    got = {r["sitename"]: r["value"]
           for r in extract_points_bilinear(pts, grid, GEOREF).collect()}
    assert got["center"] == pytest.approx(_cell(0, 3, 2))
    assert got["midx"] == pytest.approx((_cell(0, 3, 2) + _cell(0, 4, 2)) / 2)
    v = (
        _cell(0, 3, 2) * 0.75 * 0.5 + _cell(0, 4, 2) * 0.25 * 0.5
        + _cell(0, 3, 3) * 0.75 * 0.5 + _cell(0, 4, 3) * 0.25 * 0.5
    )
    assert got["quarter"] == pytest.approx(v)


def test_bilinear_outside_grid_is_null(spark):
    grid = synth_raster(spark, GEOREF, bands=2)
    pts = spark.createDataFrame(
        [("way_out", 99.0, 99.0), ("edge_out", 0.25 + 9.6 * 0.5, 1.0),
         ("inside", 1.0, 1.0)],
        "sitename string, lon double, lat double",
    )
    out = extract_points_bilinear(pts, grid, GEOREF)
    rows = {(r["sitename"], r["band"]): r["value"] for r in out.collect()}
    assert len(rows) == 6  # every point x band present, outside ones as NULL
    assert rows[("way_out", 0)] is None and rows[("way_out", 1)] is None
    assert rows[("edge_out", 0)] is None  # ix0+1 = 10 out of 0..9
    assert rows[("inside", 0)] is not None


def test_bilinear_plan_broadcasts_points_not_raster(spark):
    grid = synth_raster(spark, GEOREF, bands=1)
    pts = spark.createDataFrame(
        [("a", 1.0, 1.0)], "sitename string, lon double, lat double"
    )
    plan = extract_points_bilinear(pts, grid, GEOREF)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_fetch_with_retry_succeeds_after_failures():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError(f"attempt {calls['n']} failed")
        return "payload"

    out = fetch_with_retry(flaky, max_tries=5, sleep_s=1.0, backoff=2.0,
                           sleeper=sleeps.append)
    assert out == "payload" and calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # exponential backoff, no sleep after success


def test_fetch_with_retry_exhausts_loudly():
    def dead():
        raise TimeoutError("endpoint down")

    with pytest.raises(RetryExhausted, match="all 3 attempts failed"):
        fetch_with_retry(dead, what="modis", max_tries=3, sleeper=lambda s: None)


def test_subprocess_source_end_to_end(spark, tmp_path):
    """S10: a real python child process materializes CSV; Spark scans it."""
    out_csv = str(tmp_path / "gee_subset.csv")
    script = (
        "import sys\n"
        "rows = ['sitename,date,fpar']\n"
        "rows += [f's1,2020-01-{d:02d},{d*10}' for d in range(1, 6)]\n"
        f"open({out_csv!r}, 'w').write('\\n'.join(rows))\n"
    )
    path = run_subprocess_source([sys.executable, "-c", script], out_csv)
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    assert df.count() == 5
    assert df.agg(F.sum("fpar")).collect()[0][0] == 150


def test_subprocess_source_failure_surfaces_stderr(tmp_path):
    with pytest.raises(RuntimeError, match="exited 3"):
        run_subprocess_source(
            [sys.executable, "-c", "import sys; sys.exit(3)"],
            str(tmp_path / "never.csv"),
        )
    with pytest.raises(RuntimeError, match="produced no output"):
        run_subprocess_source(
            [sys.executable, "-c", "pass"], str(tmp_path / "missing.csv")
        )


def test_bilinear_edge_half_cell_defined(spark):
    """A point exactly ON the last cell-center row/column has fx/fy == 0:
    the off-grid corners carry weight 0, so the value is defined (terra
    returns data in the outer half-cell ring — review r4 finding)."""
    grid = synth_raster(spark, GEOREF, bands=1)
    last_x = 0.25 + 9 * 0.5   # ix0 = 9 = nx-1, fx = 0
    last_y = 0.25 + 7 * 0.5   # iy0 = 7 = ny-1, fy = 0
    pts = spark.createDataFrame(
        [("corner_cell", last_x, last_y), ("edge_col", last_x, 1.25),
         ("edge_row", 1.25, last_y)],
        "sitename string, lon double, lat double",
    )
    got = {r["sitename"]: r["value"]
           for r in extract_points_bilinear(pts, grid, GEOREF).collect()}
    assert got["corner_cell"] == pytest.approx(_cell(0, 9, 7))
    assert got["edge_col"] == pytest.approx(_cell(0, 9, 2))
    assert got["edge_row"] == pytest.approx(_cell(0, 2, 7))


def test_bilinear_duplicate_grid_cell_raises(spark):
    """ADVICE r4: a duplicated (band, ix, iy) grid row must surface as an
    error, not be silently resolved by the max() corner gather."""
    grid = synth_raster(spark, GEOREF, bands=1)
    dup = grid.limit(0).sparkSession.createDataFrame(
        [(0, 3, 2, 999999.0)], "band int, ix int, iy int, value double"
    )
    corrupted = grid.unionByName(dup)
    pts = spark.createDataFrame(
        [("center", 0.25 + 3 * 0.5, 0.25 + 2 * 0.5)],
        "sitename string, lon double, lat double",
    )
    with pytest.raises(Exception, match="duplicate"):
        extract_points_bilinear(pts, corrupted, GEOREF).collect()
