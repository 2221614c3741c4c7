"""Smoothing-fill kernels: LOESS, cubic smoothing spline, Savitzky-Golay
(SURVEY §2.7 G3/G4/G5) + the method mux (G6).

Reference behavior: fit on the non-NA subset of a per-key series, predict the
full date spine (R/gapfill_interpol.R:413-519). These are declared
TOLERANCE-TIER (numerical parity with R's loess/smooth.spline is not a goal —
SURVEY §7.3-4); linear+LOCF are the exact-match tier.

scipy/statsmodels are not available in this container, so all three kernels
are pure numpy:

* LOESS — local weighted regression, tricube weights over the span-nearest
  neighbors, degree-2 polynomial (R loess default family=gaussian, degree=2).
* Smoothing spline — natural cubic smoothing spline via the Reinsch (1967)
  tridiagonal formulation; `lam` is the roughness penalty.
* Savitzky-Golay — least-squares filter coefficients from the Vandermonde
  pseudo-inverse; edges predicted from the boundary window's polynomial fit
  (scipy mode='interp' behavior). Defaults p=3, n=51 like the reference
  (R/gapfill_interpol.R:491-519).

Spark-level: :func:`smooth_fill` runs one kernel per key via applyInPandas
after an explicit repartition (north-rule explicit partitioning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def loess_fit(x: np.ndarray, y: np.ndarray, xout: np.ndarray, span: float = 0.75,
              degree: int = 2) -> np.ndarray:
    """Predict ``xout`` from a LOESS fit of (x, y)."""
    n = len(x)
    k = max(degree + 1, int(np.ceil(span * n)))
    k = min(k, n)
    out = np.empty(len(xout))
    for i, x0 in enumerate(xout):
        d = np.abs(x - x0)
        idx = np.argsort(d)[:k]
        dmax = d[idx].max()
        w = (1 - (d[idx] / (dmax if dmax > 0 else 1)) ** 3) ** 3
        w = np.maximum(w, 1e-12)
        A = np.vander(x[idx] - x0, degree + 1, increasing=True)
        W = np.sqrt(w)
        coef, *_ = np.linalg.lstsq(A * W[:, None], y[idx] * W, rcond=None)
        out[i] = coef[0]  # value at offset 0 == x0
    return out


def smoothing_spline_fit(x: np.ndarray, y: np.ndarray, xout: np.ndarray,
                         lam: float = 1.0) -> np.ndarray:
    """Natural cubic smoothing spline (Reinsch formulation):
    minimize ||y - f||² + lam * ∫ f''(t)² dt over natural cubic splines with
    knots at x. Solves (I + lam·K) f = y with K = Δᵀ W⁻¹ Δ, then evaluates
    the natural spline through (x, f) at xout."""
    n = len(x)
    if n < 3:
        return np.interp(xout, x, y)
    h = np.diff(x).astype(float)
    # second-difference operator Δ: (n-2) x n
    delta = np.zeros((n - 2, n))
    for i in range(n - 2):
        delta[i, i] = 1.0 / h[i]
        delta[i, i + 1] = -1.0 / h[i] - 1.0 / h[i + 1]
        delta[i, i + 2] = 1.0 / h[i + 1]
    # W: (n-2) x (n-2) tridiagonal Gram matrix of natural spline 2nd derivs
    W = np.zeros((n - 2, n - 2))
    for i in range(n - 2):
        W[i, i] = (h[i] + h[i + 1]) / 3.0
        if i + 1 < n - 2:
            W[i, i + 1] = W[i + 1, i] = h[i + 1] / 6.0
    K = delta.T @ np.linalg.solve(W, delta)
    f = np.linalg.solve(np.eye(n) + lam * K, y)
    # natural-spline second derivatives at knots for evaluation
    m = np.zeros(n)
    m[1:-1] = np.linalg.solve(W, delta @ f)
    out = np.empty(len(xout))
    j = np.clip(np.searchsorted(x, xout) - 1, 0, n - 2)
    for i, x0 in enumerate(xout):
        k = j[i]
        t = (x0 - x[k]) / h[k]
        if x0 <= x[0]:        # linear extrapolation (natural boundary)
            slope = (f[1] - f[0]) / h[0] - h[0] * m[1] / 6.0
            out[i] = f[0] + slope * (x0 - x[0])
        elif x0 >= x[-1]:
            slope = (f[-1] - f[-2]) / h[-1] + h[-1] * m[-2] / 6.0
            out[i] = f[-1] + slope * (x0 - x[-1])
        else:
            out[i] = (
                (1 - t) * f[k] + t * f[k + 1]
                + h[k] ** 2 / 6.0 * (
                    ((1 - t) ** 3 - (1 - t)) * m[k] + (t**3 - t) * m[k + 1]
                )
            )
    return out


def savgol_coeffs(window: int, poly: int) -> np.ndarray:
    """Center-point least-squares filter coefficients."""
    half = window // 2
    offsets = np.arange(-half, half + 1, dtype=float)
    A = np.vander(offsets, poly + 1, increasing=True)
    # value at offset 0 of the LS fit = e0ᵀ (AᵀA)⁻¹ Aᵀ y
    return np.linalg.pinv(A)[0]


def savgol_filter(y: np.ndarray, window: int = 51, poly: int = 3) -> np.ndarray:
    """Savitzky-Golay on a regular series; shrinks the window to the series
    length (odd) when short; edges from the boundary window's polynomial."""
    n = len(y)
    if n == 0:
        return y.copy()
    w = min(window, n if n % 2 == 1 else n - 1)
    if w <= poly:
        return y.copy()
    half = w // 2
    c = savgol_coeffs(w, poly)
    out = np.convolve(y, c[::-1], mode="same")
    # edge handling: fit the first/last window once, evaluate the polynomial
    offs = np.arange(-half, half + 1, dtype=float)
    A = np.vander(offs, poly + 1, increasing=True)
    pinv = np.linalg.pinv(A)
    head_coef = pinv @ y[:w]
    tail_coef = pinv @ y[-w:]
    for i in range(half):
        out[i] = np.polyval(head_coef[::-1], i - half)
        out[n - 1 - i] = np.polyval(tail_coef[::-1], half - i)
    return out


KERNELS = {"loess", "spline", "sgolay"}


def smooth_fill(
    df: DataFrame,
    value_col: str,
    method: str = "loess",
    key_cols: list[str] | None = None,
    bucket_col: str = "bucket",
    keep_all: bool = False,
    **kw,
) -> DataFrame:
    """Fit the chosen smoother on each key's non-null points, predict every
    spine row. ``keep_all=True`` keeps one column per method plus the mux'd
    output (reference 'keep' mode, R/gapfill_interpol.R:522-535)."""
    if method not in KERNELS:
        raise ValueError(f"method {method!r}; one of {sorted(KERNELS)}")
    key_cols = key_cols or ["source"]
    methods = sorted(KERNELS) if keep_all else [method]
    base = df.withColumn(value_col, F.col(value_col).cast("double"))
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields)
    ddl += ", " + ", ".join(f"`{value_col}_{m}` double" for m in methods)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col).reset_index(drop=True)
        x = pd.to_datetime(pdf[bucket_col]).astype("int64").to_numpy() / 86400e9
        y = pdf[value_col].to_numpy(dtype="float64")
        ok = ~np.isnan(y)
        for m in methods:
            col = f"{value_col}_{m}"
            if ok.sum() < 4:
                pdf[col] = y
                continue
            if m == "loess":
                pdf[col] = loess_fit(x[ok], y[ok], x, span=kw.get("span", 0.75))
            elif m == "spline":
                pdf[col] = smoothing_spline_fit(x[ok], y[ok], x, lam=kw.get("lam", 1.0))
            else:
                filled = np.interp(x, x[ok], y[ok])
                pdf[col] = savgol_filter(
                    filled, kw.get("window", 51), kw.get("poly", 3)
                )
        return pdf

    out = base.repartition(*key_cols).groupBy(*key_cols).applyInPandas(fit, ddl)
    if not keep_all:
        # G6 mux: chosen method's column becomes the output variable
        out = out.withColumn(value_col, F.col(f"{value_col}_{method}"))
    return out
