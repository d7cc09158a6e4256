"""Cross-engine deterministic numeric helpers.

ROUND() ties are a correctness trap for oracle comparison: averages of
2-decimal money data land on exact .xx5 halves constantly, and Spark
(BigDecimal HALF_UP on the shortest decimal repr) and DuckDB disagree on
which way a half goes. `ftrunc` — floor(x·10^k)/10^k — is three IEEE-754
double ops that every engine evaluates bit-identically, so a value computed
equal in both engines stays equal after discretization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ftrunc(col: Column, k: int = 2) -> Column:
    """Truncate a double to k decimals, deterministically across engines."""
    scale = float(10**k)
    return F.floor(col * F.lit(scale)) / F.lit(scale)


def sql_ftrunc(expr: str, k: int = 2) -> str:
    # trailing `+ 0.0` canonicalizes -0.0 → +0.0: Spark's ftrunc floors to
    # LONG (sign of zero dropped) while DuckDB's double FLOOR preserves it,
    # so ftrunc(-0.0) would repr-diverge ("0.0" vs "-0.0"). For every other
    # value x + 0.0 == x exactly. Parenthesized: callers embed this string
    # inside larger expressions.
    scale = f"{10**k}.0"
    return f"(FLOOR(({expr}) * {scale}) / {scale} + 0.0)"


def cents(col: Column, k: int = 2) -> Column:
    """Fixed-point integer representation of a k-decimal money value.

    floor(x·10^k + 0.5) tolerates a half-grid of float noise around the exact
    value, and long-integer sums are exact AND faster than double sums in
    whole-stage codegen (~25% faster at sf0.1; decimal sums are 10× slower).
    This mirrors the reference's DecimalType(18,2) money semantics
    (data_seed.py:40,49) without decimal's runtime cost.
    """
    scale = float(10**k)
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def sql_cents(expr: str, k: int = 2) -> str:
    scale = f"{10**k}.0"
    return f"CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)"
