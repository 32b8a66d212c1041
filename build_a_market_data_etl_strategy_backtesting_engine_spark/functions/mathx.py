"""Math helpers: error function, normal CDF/PDF as pure column expressions.

Spark SQL has no built-in ``erf``; we use the Abramowitz & Stegun 7.1.26
rational approximation (max abs error 1.5e-7), which keeps the whole
derivatives layer inside whole-stage codegen (no Python UDF) AND is portable
ANSI arithmetic — the DuckDB oracle runs the byte-identical formula. The
reference uses scipy ``norm.cdf`` (``/root/reference/backtesting/
derivatives.py:120-202``); our parity tests (put-call parity, Greek bounds)
hold exactly because the approximation preserves ``erf(-x) = -erf(x)``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

SQRT2 = math.sqrt(2.0)
INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)

# A&S 7.1.26 coefficients
_P = 0.3275911
_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429


def erf(x: Column) -> Column:
    """A&S 7.1.26: erf(x) = sign(x) * (1 - poly(t) * exp(-x^2)),
    t = 1/(1 + p*|x|)."""
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_P) * ax)
    poly = ((((F.lit(_A5) * t + F.lit(_A4)) * t + F.lit(_A3)) * t
             + F.lit(_A2)) * t + F.lit(_A1)) * t
    y = F.lit(1.0) - poly * F.exp(-ax * ax)
    return F.signum(x) * y


def norm_cdf(x: Column) -> Column:
    """Standard normal CDF: 0.5 * (1 + erf(x / sqrt(2)))."""
    return F.lit(0.5) * (F.lit(1.0) + erf(x / F.lit(SQRT2)))


def norm_pdf(x: Column) -> Column:
    """Standard normal PDF: exp(-x^2/2) / sqrt(2*pi)."""
    return F.exp(-x * x / F.lit(2.0)) * F.lit(INV_SQRT_2PI)


def erf_sql(x: str) -> str:
    """The identical erf formula as portable SQL text (for oracles/macros).

    Composed from the same sub-expressions as :func:`erf` so the operation
    order (and therefore the FP result) matches the Column version."""
    t = f"(1.0/(1.0 + {_P!r} * abs({x})))"
    poly = (
        f"((((({_A5!r} * {t} + {_A4!r}) * {t} + {_A3!r}) * {t} + {_A2!r})"
        f" * {t} + {_A1!r}) * {t})"
    )
    y = f"(1.0 - {poly} * exp(-abs({x}) * abs({x})))"
    sign = f"(CASE WHEN ({x}) < 0 THEN -1.0 WHEN ({x}) > 0 THEN 1.0 ELSE 0.0 END)"
    return f"({sign} * {y})"


def norm_cdf_sql(x: str) -> str:
    return f"(0.5 * (1.0 + {erf_sql(f'({x}) / {SQRT2!r}')}))"


def norm_pdf_sql(x: str) -> str:
    return f"(exp(-(({x}) * ({x})) / 2.0) * {INV_SQRT_2PI!r})"
