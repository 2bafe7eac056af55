"""Cross-engine-exact decimal rounding of integer ratios.

THE problem this solves (r10/r11 post-mortem, `emb_covariance`):
``ROUND(double, k)`` is engine-ambiguous at exact decimal midpoints.
Spark rounds the SHORTEST DECIMAL REPRESENTATION of the double HALF_UP
(it routes through java.math.BigDecimal), DuckDB rounds the BINARY
value — so a comparator column like ``ROUND(qsum / ((n-1)*1e6), 5)``
flips between engines whenever the quotient lands exactly on a
5-decimal midpoint. Count-denominator rationals (averages, rates,
fixed-point sums over small denominators) hit midpoints with
probability ~1/denominator per output cell, which at thousands of
cells is a per-dataset coin flip.

The fix: never round a DOUBLE as the comparator; round the RATIONAL in
exact BIGINT arithmetic, identically on both engines, and only then
cast the already-rounded integer to double (one exact cast + one exact
power-of-ten division — both engines agree bit-for-bit on those).

:func:`round_div_sql` emits the SQL text for

    ROUND(num / den, k)   —  half-away-from-zero (BigDecimal HALF_UP)

computed entirely in INT64:

* scale |num| by 10^k via CHUNKED long division (base-100 steps:
  ``q = q*100 + (r*100) div den; r = (r*100) % den``), so no
  intermediate ever exceeds ``max(|num|, 100*den, 100*result)`` —
  a single ``num * 10^k`` multiply would overflow INT64 for money
  sums long before the division does;
* tie-break with ``+1 when 2*rem >= den`` (half-away-from-zero on the
  magnitude — exactly BigDecimal HALF_UP for either sign);
* both dialects use their native truncating integer division (Spark
  ``div``, DuckDB ``//``) — operands are all non-negative by
  construction, where truncation == floor, so the two texts compute
  the same function. (Neither engine's 128-bit escape hatch works:
  Spark ``div`` on DECIMAL(38,0) silently wraps to BIGINT and DuckDB
  ``//`` on DECIMAL returns a double — measured, not assumed.)

INT64 headroom (caller contract, asserted nowhere because the inputs
are aggregate expressions): ``|num| < 2^63``, ``100*den < 2^63``, and
``100 * |result|*10^k < 2^63``. For the repo's uses (unscaled decimal
sums over TPC-H money columns, d^2 fixed-point covariance partials)
that holds to ~sf 1000 and ~1e12 vectors; each call site documents its
own bound.

Callers MUST pass short column references (or literals) for ``num`` /
``den`` — the generated text repeats ``num`` ~4x and ``den`` ~2x per
chunk, so hand it pre-aggregated aliases, not nested SUM(...) trees.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_IDIV = {"spark": "div", "duckdb": "//"}


def round_div_sql(num: str, den: str, k: int, dialect: str) -> str:
    """SQL text for ROUND(num/den, k), half-away-from-zero, exact.

    ``num``, ``den``: SQL expressions yielding BIGINT (``den > 0``;
    ``num`` may be negative). ``dialect``: ``"spark"`` or ``"duckdb"``.
    Result text yields DOUBLE: the rounded value as
    ``CAST(scaled_int AS DOUBLE) / 10^k`` — exact because the scaled
    integer is < 2^53 under the headroom contract and a power-of-ten
    division is a single correctly-rounded IEEE op on both engines.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    idiv = _IDIV[dialect]
    # Force BIGINT: bare integer literals parse as INT32 and the
    # base-100 chunk multiplies overflow 32 bits almost immediately.
    x = f"abs(CAST({num} AS BIGINT))"
    d = f"(CAST({den} AS BIGINT))"
    q = f"({x} {idiv} {d})"
    r = f"({x} % {d})"
    t = k
    while t > 0:
        step = 2 if t >= 2 else 1
        m = 10**step
        q = f"({q} * {m} + ({r} * {m}) {idiv} {d})"
        r = f"(({r} * {m}) % {d})"
        t -= step
    # half-away-from-zero on the magnitude == BigDecimal HALF_UP
    q = f"({q} + (CASE WHEN 2 * {r} >= {d} THEN 1 ELSE 0 END))"
    signed = f"(CASE WHEN ({num}) < 0 THEN -{q} ELSE {q} END)"
    return f"(CAST({signed} AS DOUBLE) / {float(10**k)!r})"


def round_div(num: str, den: str, k: int) -> Column:
    """Spark Column for ROUND(num/den, k) — see :func:`round_div_sql`.

    ``num``/``den`` are SQL snippets over ALREADY-ALIASED columns of
    the current plan node (use a two-step select: aggregate the exact
    BIGINT numerators first, then apply this in a parent projection).
    """
    return F.expr(round_div_sql(num, den, k, "spark"))


def round_ratio(num: Column, den: Column, k: int) -> Column:
    """Column-composable ROUND(num/den, k), half-away-from-zero, exact
    — the in-row twin of :func:`round_div` for per-document ratios
    (dup-word fractions, jaccard, coverage rates) whose num/den are
    Column EXPRESSIONS, not aliased names.

    Same chunked algorithm; integer division is expressed as
    ``(x - x % d) / d`` — the float division is EXACT because the
    dividend is an exact multiple of ``d`` and both fit in 2^53
    (headroom contract: ``|num| < 2^53`` and ``100*den < 2^53`` —
    per-row counts are nowhere near it). ``den`` must be > 0.

    The oracle side of a site using this must replay
    :func:`round_div_sql` (duckdb dialect) over the same integer
    num/den — both compute the identical integer function.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    x = F.abs(num.cast("bigint"))
    d = den.cast("bigint")

    def idiv(a: Column) -> Column:
        return ((a - a % d) / d).cast("bigint")

    q = idiv(x)
    r = x % d
    t = k
    while t > 0:
        step = 2 if t >= 2 else 1
        m = F.lit(10**step)
        q = q * m + idiv(r * m)
        r = (r * m) % d
        t -= step
    q = q + F.when(F.lit(2) * r >= d, F.lit(1)).otherwise(F.lit(0))
    signed = F.when(num < 0, -q).otherwise(q)
    return signed.cast("double") / F.lit(float(10**k))
