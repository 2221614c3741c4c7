"""Monthly→daily temporal downscaling (SURVEY §2.7 G7/G8/G9).

Reference semantics re-expressed as numpy kernels inside grouped pandas UDFs:

* G7 ``monthly2daily`` (R/ingest_globalfields.R:1538-1626): per month fit a
  quadratic y = a·x² + b·x + c whose boundary values at month midpoints blend
  adjacent months (day-count-weighted) and whose monthly mean approximately
  conserves the input; ``method="step"`` repeats the monthly value.
* G8 ``get_daily_prec`` (R/ingest_globalfields.R:1397-1517): distribute a
  monthly precipitation total over stochastic wet days — Geng et al. (1986)
  transitional wet/dry probabilities, exponential amounts
  ``(-ln v)^1.2 · mprec/wetd``, ≤50 retries per month if it never rained,
  renormalization to the monthly total, drizzle (<0.1) zeroed.
  DETERMINISM SPEC: the reference seeds from an uninitialized random draw
  (R/ingest_globalfields.R:1432) and its own tests therefore skip precip
  (tests/testthat/test_CRU_WFDEI_NDEP.R:158). This engine *defines* the seed
  as a stable 64-bit hash of (key, year) — same output on any cluster, any
  partitioning, any rerun.
* G9 orchestration (R/ingest_globalfields.R:984-998): group_split per
  (site, year) + map → here ``groupBy(key, year).applyInPandas`` after an
  explicit repartition, with prev-Dec / next-Jan boundary values provided by
  window lag/lead over the monthly series (no cross-group peeking inside the
  UDF).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NDAY = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
_NDAY_LEAP = np.array([31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def _ndaymonth(leap: bool) -> np.ndarray:
    return _NDAY_LEAP if leap else _NDAY


def is_leap(year: int) -> bool:
    return year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)


def monthly2daily(
    mval: np.ndarray,
    method: str = "polynom",
    mval_prev: float | None = None,
    mval_next: float | None = None,
    leapyear: bool = False,
) -> np.ndarray:
    """Quadratic-blend downscaling of 12 monthly values to daily values."""
    mval = np.asarray(mval, dtype=np.float64)
    nd = _ndaymonth(leapyear)
    if mval_prev is None:
        mval_prev = float(mval[-1])
    if mval_next is None:
        mval_next = float(mval[0])
    if method == "step":
        return np.repeat(mval, nd)
    if method != "polynom":
        raise ValueError(f"method {method!r}; one of polynom/step")

    dval = np.empty(int(nd.sum()))
    endt = 0.5                 # midpoint between Dec and Jan
    dt = 31.0                  # days of previous December
    last = mval_prev
    day = 0
    for m in range(12):
        dtold = dt
        dt = float(nd[m])
        startt = endt
        endt = endt + dt
        if m < 11:
            dtnew, nxt = float(nd[m + 1]), mval[m + 1]
        else:
            dtnew, nxt = float(nd[0]), mval_next
        # month-boundary values: day-count-weighted blends of neighbours
        # NOTE: every power is written as an explicit product (x*x, not x**2)
        # so the arithmetic is a fixed left-associative IEEE operation order
        # reproducible verbatim in the DuckDB oracle (oracles.py
        # DOWNSCALE_POLYNOM mirrors these formulas token-for-token).
        starttemp = (mval[m] * dt + last * dtold) / (dt + dtold)
        endtemp = (nxt * dtnew + mval[m] * dt) / (dtnew + dt)
        delta = endtemp - starttemp
        d2t = endt * endt - startt * startt
        d3t = endt * endt * endt - startt * startt * startt
        # quadratic coefficients conserving the monthly mean (approximately)
        a = (mval[m] * dt - delta * d2t / dt / 2.0 - starttemp * dt + delta * startt) / (
            d3t / 3.0 - d2t * d2t / dt / 2.0 - dt * (startt * startt) + startt * d2t
        )
        b = delta / dt - a * (startt + endt)
        c = starttemp - a * (startt * startt) - b * startt
        days = np.arange(day + 1, day + int(dt) + 1, dtype=np.float64)
        dval[day : day + int(dt)] = a * (days * days) + b * days + c
        day += int(dt)
        last = mval[m]
    return dval


def stable_seed(*parts) -> int:
    """Deterministic 63-bit seed from arbitrary key parts (blake2b)."""
    h = hashlib.blake2b("|".join(str(p) for p in parts).encode(), digest_size=8)
    return int.from_bytes(h.digest(), "big") >> 1


def get_daily_prec(
    mval_prec: np.ndarray,
    mval_wet: np.ndarray,
    seed: int,
    leapyear: bool = False,
) -> np.ndarray:
    """Seeded stochastic wet-day generator (Geng 1986 / LPX semantics)."""
    nd = _ndaymonth(leapyear)
    ndayyear = int(nd.sum())
    rng = np.random.RandomState(seed & 0xFFFFFFFF)
    base = rng.uniform(size=(ndayyear, 2))  # the reference's prdaily_random
    c1, c2 = 1.0, 1.2

    prec = np.zeros(ndayyear)
    mval_prec = np.asarray(mval_prec, dtype=np.float64)
    mval_wet = np.maximum(np.asarray(mval_wet, dtype=np.float64), 1.0)
    doy = 0
    daysum = 0
    for m in range(12):
        prob_rain = mval_wet[m] / nd[m]
        mprecave = mval_prec[m] / mval_wet[m]
        month_start = doy
        iloop = 0
        while True:
            iloop += 1
            nwet = 0
            mtot = 0.0
            doy = month_start
            for _ in range(int(nd[m])):
                # transitional probability: wetter after a wet day
                if doy > 0:
                    if prec[doy - 1] < 0.1:
                        prob = 0.75 * prob_rain
                    else:
                        prob = 0.25 + 0.75 * prob_rain
                else:
                    prob = prob_rain
                vv = base[doy, 0] if iloop == 1 else rng.uniform()
                if vv > prob:
                    prec[doy] = 0.0
                else:
                    nwet += 1
                    v1 = base[doy, 1] if iloop == 1 else rng.uniform()
                    amt = ((-np.log(v1)) ** c2) * mprecave * c1
                    prec[doy] = 0.0 if amt < 0.1 else amt
                mtot += prec[doy]
                doy += 1
            if not (nwet == 0 and iloop < 50 and mval_prec[m] > 0.1):
                break
        # renormalize to the monthly total; drizzle -> 0
        if m > 0:
            daysum += int(nd[m - 1])
        mtot = max(mtot, 1.0)
        for d in range(int(nd[m])):
            i = daysum + d
            prec[i] *= mval_prec[m] / mtot
            if prec[i] < 0.1:
                prec[i] = 0.0
    return prec


# ---- Spark-level orchestration (G9) -----------------------------------------

def downscale_monthly(
    df: DataFrame,
    value_cols: list[str],
    method: str = "polynom",
    prec_col: str | None = None,
    wetd_col: str | None = None,
    key_col: str = "sitename",
    year_col: str = "year",
    moy_col: str = "moy",
    noleap: bool = False,
) -> DataFrame:
    """Expand a monthly table ``(key, year, moy, vars…)`` to daily rows.

    ``value_cols`` are downscaled with the quadratic kernel (boundary values
    from lag/lead over the ordered monthly series); ``prec_col`` (with
    ``wetd_col``) uses the seeded wet-day generator. Output:
    (key, date, <vars…>[, prec]).
    """
    w = Window.partitionBy(key_col).orderBy(year_col, moy_col)
    enriched = df
    for c in value_cols:
        enriched = enriched.withColumn(f"_prev_{c}", F.lag(c).over(w))
        enriched = enriched.withColumn(f"_next_{c}", F.lead(c).over(w))

    out_fields = [
        T.StructField(key_col, df.schema[key_col].dataType),
        T.StructField("date", T.DateType()),
    ]
    out_fields += [T.StructField(c, T.DoubleType()) for c in value_cols]
    if prec_col:
        out_fields.append(T.StructField(prec_col, T.DoubleType()))
    schema = T.StructType(out_fields)

    def expand(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(moy_col)
        if len(pdf) != 12:
            # dtype-correct empty frame (a bare [] defaults to float64,
            # which Arrow refuses to cast to date32)
            empty = {key_col: pd.Series([], dtype=object),
                     "date": pd.Series([], dtype="datetime64[ns]")}
            for c in value_cols:
                empty[c] = pd.Series([], dtype="float64")
            if prec_col:
                empty[prec_col] = pd.Series([], dtype="float64")
            return pd.DataFrame(empty)
        key = pdf[key_col].iloc[0]
        year = int(pdf[year_col].iloc[0])
        leap = (not noleap) and is_leap(year)
        nd = _ndaymonth(leap)
        dates = pd.date_range(f"{year}-01-01", periods=int(nd.sum()), freq="D")
        if noleap and is_leap(year):
            dates = pd.date_range(f"{year}-01-01", f"{year}-12-31", freq="D")
            dates = dates[~((dates.month == 2) & (dates.day == 29))]
        out = {key_col: key, "date": dates.date}
        for c in value_cols:
            mval = pdf[c].to_numpy(dtype=np.float64)
            prev = pdf[f"_prev_{c}"].iloc[0]
            nxt = pdf[f"_next_{c}"].iloc[-1]
            out[c] = monthly2daily(
                mval, method,
                None if pd.isna(prev) else float(prev),
                None if pd.isna(nxt) else float(nxt),
                leapyear=leap,
            )
        if prec_col:
            out[prec_col] = get_daily_prec(
                pdf[prec_col].to_numpy(dtype=np.float64),
                pdf[wetd_col].to_numpy(dtype=np.float64),
                seed=stable_seed(key, year),
                leapyear=leap,
            )
        return pd.DataFrame(out)

    return (
        enriched.repartition(key_col, year_col)
        .groupBy(key_col, year_col)
        .applyInPandas(expand, schema)
    )
