"""Pandas-UDF-shaped χ² distribution adapters (SURVEY §2 parity, r9).

The reference exposes its χ²(1 dof) kernels as scalar Pandas UDFs
(reference: common/udf.py:21 ``chi2_inverse_survival_function``, :63
``chi2_survival_function``, scipy-backed). This engine computes the
same functions as pure Column expressions
(functions/distributions.py:106,112 — JVM-side, whole-stage codegen,
the better plan at scale), but the reference's PUBLIC API POINT is the
Pandas-UDF shape, so users porting code that imports those names get
drop-in equivalents here.

The numpy kernels use the SAME coefficient tables and Horner ordering
as the Column/SQL builders (A&S 7.1.26 erfc, Acklam probit), so all
three surfaces agree to the approximation's own error (~1.5e-7), and
the doctest fixtures from the reference hold at 2 dp.

Prefer the Column kernels in engine-internal plans: an Arrow exchange
for a pointwise double→double function is pure overhead. These
adapters exist for API parity and for user code already written
against the reference's UDF surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gentropy_spark.functions.distributions import (
    _ACK_A,
    _ACK_B,
    _ACK_C,
    _ACK_D,
    _ERF_A,
    _ERF_P,
    _P_LOW,
)


def _erfc_np(x: np.ndarray) -> np.ndarray:
    """erfc via A&S 7.1.26 — numpy twin of distributions.erfc_col."""
    ax = np.abs(x)
    t = 1.0 / (1.0 + _ERF_P * ax)
    a = _ERF_A
    poly = ((((a[4] * t + a[3]) * t + a[2]) * t + a[1]) * t + a[0]) * t
    pos = poly * np.exp(-(ax * ax))
    return np.where(x >= 0, pos, 2.0 - pos)


def _ack_tail_np(q: np.ndarray) -> np.ndarray:
    c, d = _ACK_C, _ACK_D
    num = ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
    den = (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
    return num / den


def _probit_np(p: np.ndarray) -> np.ndarray:
    """Acklam inverse normal CDF — numpy twin of probit_col."""
    a, b = _ACK_A, _ACK_B
    p = np.asarray(p, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        q_low = np.sqrt(-2.0 * np.log(np.where(p > 0, p, np.nan)))
        q_high = np.sqrt(-2.0 * np.log(np.where(p < 1, 1.0 - p, np.nan)))
    qc = p - 0.5
    r = qc * qc
    num = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * qc
    den = ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    central = num / den
    return np.where(
        p < _P_LOW,
        _ack_tail_np(q_low),
        np.where(p > 1.0 - _P_LOW, -_ack_tail_np(q_high), central),
    )


def chi2_isf_1df_np(p: np.ndarray) -> np.ndarray:
    """χ²(1) inverse survival function: probit(p/2)²."""
    z = _probit_np(np.asarray(p, dtype=np.float64) / 2.0)
    return z * z


def chi2_sf_1df_np(x: np.ndarray) -> np.ndarray:
    """χ²(1) survival function: erfc(√(x/2))."""
    return _erfc_np(np.sqrt(np.asarray(x, dtype=np.float64) / 2.0))


@pandas_udf(T.DoubleType())
def chi2_inverse_survival_function(x: pd.Series) -> pd.Series:
    """χ² statistic for a given p-value (1 dof).

    Reference parity (common/udf.py:21) — same name, same scalar
    Pandas-UDF shape, same doctest fixtures:
    0.1 → 2.71, 0.05 → 3.84, 0.001 → 10.83 (2 dp).
    """
    return pd.Series(chi2_isf_1df_np(x.to_numpy(dtype=np.float64)))


@pandas_udf(T.DoubleType())
def chi2_survival_function(x: pd.Series) -> pd.Series:
    """p-value for a given χ² statistic / squared z-score (1 dof).

    Reference parity (common/udf.py:63): 1.0 → 0.32, 100.0 → 0.0
    (2 dp).
    """
    return pd.Series(chi2_sf_1df_np(x.to_numpy(dtype=np.float64)))
