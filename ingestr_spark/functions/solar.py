"""SPLASH v1.0 daily solar radiation / PPFD (SURVEY §2.8 F4) as pure Spark
column expressions.

Reference: calc_daily_solar (R/calc_daily_solar.R:274-442) with
berger_tls (:150-189) — Berger (1978) true anomaly/longitude, Berger et al.
(1993) distance factor, Woolf (1968) declination, sunset hour angle with
polar day/night clamps, Duffie & Beckman extraterrestrial radiation,
Linacre (1968) transmissivity, Meek et al. (1984) flux-to-energy PPFD.

The reference derives time-varying orbital parameters from Berger's series
(R/calc_daily_solar_orbpar.R); for the engine's purposes (years ~1900-2100)
they are effectively constant, so they are ARGUMENTS with modern-epoch
defaults — tolerance-tier vs the reference (sub-0.1% for modern years). The
whole computation is one column-expression tree: vectorized row-wise over
(lat, doy) with no UDF (the reference applies it rowwise(),
R/ingest_globalfields.R:408-425 — a hot spot we get for free).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# constants (R/calc_daily_solar.R:115-135)
KALB_VIS = 0.03     # visible-light albedo (Sellers, 1985)
KC = 0.25           # Linacre (1968)
KD = 0.50           # Linacre (1968)
KF_FEC = 2.04       # umol/J (Meek et al., 1984)
KGSC = 1360.8       # solar constant W/m^2 (Kopp & Lean, 2011)
# modern-epoch orbital parameters (Berger 1978 series at ~J2000)
OBLIQ = 23.44
ECCEN = 0.01670
OMEGA = 283.33      # longitude of perihelion, degrees

PIR = math.pi / 180.0


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(float(x))


def _dsin(deg: Column) -> Column:
    return F.sin(deg * PIR)


def _dcos(deg: Column) -> Column:
    return F.cos(deg * PIR)


def berger_tls(n, n_days=365.0, ke: float = ECCEN, komega: float = OMEGA) -> tuple[Column, Column]:
    """True anomaly (nu) and true longitude (lambda), degrees."""
    xee = ke**2
    xec = ke**3
    xse = math.sqrt(1 - xee)
    # mean longitude of the vernal equinox (scalar — orbital params constant)
    xlam = (
        (ke / 2.0 + xec / 8.0) * (1 + xse) * math.sin(komega * PIR)
        - xee / 4.0 * (0.5 + xse) * math.sin(2 * komega * PIR)
        + xec / 8.0 * (1.0 / 3.0 + xse) * math.sin(3 * komega * PIR)
    )
    xlam = 2.0 * xlam / PIR
    dlamm = F.lit(xlam) + (_c(n) - 80.0) * (360.0 / _c(n_days))
    anm = dlamm - komega
    ranm = anm * PIR
    ranv = (
        ranm
        + (2.0 * ke - xec / 4.0) * F.sin(ranm)
        + 5.0 / 4.0 * xee * F.sin(2.0 * ranm)
        + 13.0 / 12.0 * xec * F.sin(3.0 * ranm)
    )
    anv = ranv / PIR
    tls = anv + komega
    tls = F.when(tls < 0, tls + 360).when(tls > 360, tls - 360).otherwise(tls)
    nu = tls - komega
    nu = F.when(nu < 0, nu + 360).otherwise(nu)
    return nu, tls


def calc_daily_solar(
    lat,
    doy,
    elv=0.0,
    sf=1.0,
    n_days=365.0,
    ke: float = ECCEN,
    keps: float = OBLIQ,
    komega: float = OMEGA,
) -> dict[str, Column]:
    """Column expressions for the SPLASH daily solar terms.

    Returns dict with dr (distance factor), delta_deg (declination),
    hs_deg (sunset hour angle), ra_j_m2 (extraterrestrial radiation),
    tau (transmissivity), ppfd_mol_m2.
    """
    nu, lam = berger_tls(doy, n_days, ke, komega)
    # distance factor (Berger et al. 1993)
    rho = (1 - ke**2) / (1 + ke * _dcos(nu))
    dr = (1 / rho) ** 2
    # declination (Woolf 1968), degrees
    delta = F.asin(_dsin(lam) * math.sin(keps * PIR)) / PIR
    ru = _dsin(delta) * _dsin(_c(lat))
    rv = _dcos(delta) * _dcos(_c(lat))
    # sunset hour angle with polar clamps
    ratio = ru / rv
    hs = (
        F.when(ratio >= 1.0, F.lit(180.0))     # polar day
        .when(ratio <= -1.0, F.lit(0.0))       # polar night
        .otherwise(F.acos(-ratio) / PIR)
    )
    # daily extraterrestrial radiation, J/m^2 (Duffie & Beckman eq. 1.10.3)
    ra_d = (86400.0 / math.pi) * KGSC * dr * (ru * PIR * hs + rv * _dsin(hs))
    # transmissivity (Linacre 1968; Allen 1996 elevation correction)
    tau = (KC + KD * _c(sf)) * (1 + 2.67e-5 * _c(elv))
    ppfd = 1e-6 * KF_FEC * (1 - KALB_VIS) * tau * ra_d
    return {
        "dr": dr,
        "delta_deg": delta,
        "hs_deg": hs,
        "ra_j_m2": ra_d,
        "tau": tau,
        "ppfd_mol_m2": ppfd,
    }


def with_ppfd(df, lat_col="lat", doy_col="doy", elv_col=None, sf_col=None):
    """Attach ppfd (and the intermediate solar terms) to a DataFrame."""
    terms = calc_daily_solar(
        F.col(lat_col),
        F.col(doy_col),
        elv=F.col(elv_col) if elv_col else 0.0,
        sf=F.col(sf_col) if sf_col else 1.0,
    )
    for name, col in terms.items():
        df = df.withColumn(name, col)
    return df
