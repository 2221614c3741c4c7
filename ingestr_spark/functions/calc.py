"""Scalar environmental functions (SURVEY §2.8 F1-F10) as Spark column
expressions.

The reference applies several of these ``rowwise()`` (R/ingest.R:599-611) —
a row-at-a-time hot spot; here every function is a pure Column expression
that stays inside WholeStageCodegen (no UDFs, vectorized by construction).

Formulas (with reference citations):
* calc_patm — barometric pressure from elevation (R/calc_patm.R:34-47).
* calc_vp / calc_vp_inst / calc_eact — specific humidity → vapour pressure
  (R/calc_vp.R:13-88; R/calc_vpd.R:121-138).
* calc_vpd / calc_vpd_inst — saturation vapour pressure deficit, clamped >= 0;
  tmin/tmax mean variant (R/calc_vpd.R:18-119).
* calc_tgrowth — sine-diurnal-cycle growth temperature (R/calc_tgrowth.R:46-70).
* solar_declination — solar declination angle; standard Cooper (1969)
  approximation standing in for the reference's Berger (1978) true-longitude
  computation (R/calc_daily_solar.R:150-189) — documented tolerance-tier.
* unit conversions (R/get_obs_bysite_fluxnet.R:988-1072 and others).
* decimal_date (lubridate::decimal_date analog, used for interpolation axes).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# constants (R/calc_patm.R:37-42)
K_TO = 298.15     # base temperature, K
K_L = 0.0065      # adiabatic lapse rate, K/m
K_G = 9.80665     # gravitational acceleration, m/s^2
K_R = 8.3145      # universal gas constant, J/mol/K
K_MA = 0.028963   # molecular weight of dry air, kg/mol
# (R/calc_vp.R:75-78 use slightly different R and g/mol units)
K_R_VP = 8.3143
K_MV_G = 18.02
K_MA_G = 28.963


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(float(x))


def calc_patm(elv, patm0: float = 101325.0) -> Column:
    """p(z) = p0 (1 - Lz/T0)^(gM/(RL))."""
    return _c(patm0) * F.pow(
        F.lit(1.0) - F.lit(K_L) * _c(elv) / F.lit(K_TO),
        F.lit(K_G * K_MA / (K_R * K_L)),
    )


def calc_eact(qair, patm) -> Column:
    """Actual vapour pressure from specific humidity + pressure."""
    wair = _c(qair) / (F.lit(1.0) - _c(qair))
    rv = F.lit(K_R_VP / K_MV_G)
    rd = F.lit(K_R_VP / K_MA_G)
    return _c(patm) * wair * rv / (rd + wair * rv)


def calc_vp_inst(qair, patm) -> Column:
    return calc_eact(qair, patm)


def calc_vp(qair, patm=None, elv=None) -> Column:
    p = _c(patm) if patm is not None else calc_patm(elv)
    return calc_vp_inst(qair, p)


def esat(tc) -> Column:
    """Saturation vapour pressure, Pa: 611 * exp(17.27 tc / (tc + 237.3))."""
    t = _c(tc)
    return F.lit(611.0) * F.exp(F.lit(17.27) * t / (t + F.lit(237.3)))


def calc_vpd_inst(tc, qair=None, eact=None, patm=None, elv=None) -> Column:
    """esat(tc) - eact, clamped at 0 (R/calc_vpd.R:106-118)."""
    if eact is None:
        p = _c(patm) if patm is not None else calc_patm(elv)
        eact = calc_eact(qair, p)
    return F.greatest(F.lit(0.0), esat(tc) - _c(eact))


def calc_vpd(tc=None, tmin=None, tmax=None, qair=None, eact=None,
             patm=None, elv=None) -> Column:
    """Mean of tmin/tmax VPDs when both given, else VPD at tc
    (R/calc_vpd.R:54-61)."""
    if tmin is not None and tmax is not None:
        lo = calc_vpd_inst(tmin, qair=qair, eact=eact, patm=patm, elv=elv)
        hi = calc_vpd_inst(tmax, qair=qair, eact=eact, patm=patm, elv=elv)
        both = (lo + hi) / F.lit(2.0)
        if tc is None:
            return both
        fallback = calc_vpd_inst(tc, qair=qair, eact=eact, patm=patm, elv=elv)
        return F.when(_c(tmin).isNotNull() & _c(tmax).isNotNull(), both).otherwise(fallback)
    return calc_vpd_inst(tc, qair=qair, eact=eact, patm=patm, elv=elv)


def solar_declination(doy) -> Column:
    """Cooper (1969) declination, degrees (tolerance-tier stand-in for the
    reference's Berger 1978 orbital computation)."""
    return F.lit(23.45) * F.sin(
        F.lit(2.0 * math.pi) * (F.lit(284.0) + _c(doy)) / F.lit(365.0)
    )


def calc_tgrowth(tmin, tmax, lat, doy) -> Column:
    """Growth temperature from the sine diurnal cycle
    (R/calc_tgrowth.R:46-70); x = -tan(lat) tan(decl)."""
    rad = F.lit(math.pi / 180.0)
    x = -F.tan(_c(lat) * rad) * F.tan(solar_declination(doy) * rad)
    x = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), x))  # polar clamp
    frac = F.sqrt(F.lit(1.0) - x * x) / (F.lit(2.0) * F.acos(x))
    return _c(tmax) * (F.lit(0.5) + frac) + _c(tmin) * (F.lit(0.5) - frac)


def decimal_date(date_col) -> Column:
    """lubridate::decimal_date analog: year + (doy-1)/days_in_year."""
    y = F.year(date_col)
    days = F.when(
        (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0)), 366.0
    ).otherwise(365.0)
    return y + (F.dayofyear(date_col) - F.lit(1)) / days


# ---- unit conversions (F6, F10) --------------------------------------------

def hpa_to_pa(col) -> Column:
    return _c(col) * F.lit(100.0)


def kpa_to_pa(col) -> Column:
    return _c(col) * F.lit(1000.0)


def wm2_to_ppfd(col) -> Column:
    """W/m² shortwave → mol photons m-2 s-1 (×2.04e-6, kfFEC·1e-6)."""
    return _c(col) * F.lit(2.04e-6)


def mm_per_day_to_mm_per_s(col) -> Column:
    return _c(col) / F.lit(86400.0)


def mm_per_hh_to_mm_per_s(col) -> Column:
    return _c(col) / F.lit(1800.0)


def kelvin_to_celsius(col) -> Column:
    return _c(col) - F.lit(273.15)


def gpp_mol_to_gc(col) -> Column:
    """mol CO2 → g C (×12.0107, R/get_obs_bysite_gpp_gepisat.R:110-114)."""
    return _c(col) * F.lit(12.0107)
