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

import functools

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


@functools.lru_cache(maxsize=256)
def round_div(num: str, den: str, k: int) -> Column:
    """Spark Column for ROUND(num/den, k) — see :func:`round_div_sql`.

    ``num``/``den`` are SQL snippets over ALREADY-ALIASED columns of
    the current plan node (use a two-step select: aggregate the exact
    BIGINT numerators first, then apply this in a parent projection).

    Memoized: the chunked k=6 text is ~2 KB and F.expr parses it JVM-
    side at CALL time — a measured 0.26 s of tpch_q1's 0.61 s bench
    median was pure re-parsing of its three avg chains on every query
    build. A Column is an immutable unresolved expression tree
    (resolved per-plan), so reuse across queries is the same as a
    module-level ``F.col(...) * 2``; the cache key is the exact
    (num, den, k) text triple.
    """
    return F.expr(round_div_sql(num, den, k, "spark"))


def scaled_round_half(t: Column, d: Column) -> Column:
    """round-half-away-from-zero of ``t/d`` as BIGINT, for
    NON-NEGATIVE BIGINT ``t`` and positive BIGINT ``d`` — the shared
    primitive under :func:`round_ratio` and pre-reduced call sites.

    Spark's ``div`` (IntegralDivide) and ``%`` are EXACT single native
    ops on BIGINT — truncating, which equals floor for the
    non-negative operands of this contract — so the whole round is one
    div, one mod, one compare: a ~8-node tree with each operand
    referenced at most 3x. (``div`` has no Column operator in PySpark;
    ``F.call_function("div", ...)`` resolves the same SQL function an
    ``a div b`` expression does.)

    The r12 formulation seeded floor(double/double) and pinned it with
    two integer correction steps; each step re-referenced the previous
    quotient SUBTREE ~3x, so the expression expanded ~27-fold, and the
    nested CASE WHEN branches blocked codegen subexpression
    elimination — measured 2x on with_quality's scoring projection
    (BENCH r12→r13: text_quality_prune 0.30→0.61 s) and 2-3x on gated
    per-row ratios before that (BENCH r12 run-1: text_gopher_rules
    x3.2, the same class via the base-100 chunk chain). An exact
    decimal-division form was measured ~20% over double arithmetic;
    native div matches double arithmetic's cost while staying exact.

    Headroom contract: ``t < 2^63`` (caller scales), ``2*d < 2^63``,
    both non-negative. ``t``/``d`` are referenced a handful of times
    in the expression tree — pass CHEAP expressions (column refs, int
    arithmetic); materialize regexp/fold-derived counts into columns
    first.
    """
    q = F.call_function("div", t, d)
    r = t % d
    return q + F.when(F.lit(2) * r >= d, F.lit(1)).otherwise(F.lit(0))


def round_ratio(num: Column, den: Column, k: int) -> Column:
    """Column-composable ROUND(num/den, k), half-away-from-zero, exact
    — the in-row twin of :func:`round_div` for per-document ratios
    (dup-word fractions, jaccard, coverage rates) whose num/den are
    Column EXPRESSIONS, not aliased names.

    Closed form: ``floor((2t + d) / (2d))`` with ``t = |num|*10^k`` IS
    half-up of ``t/d``, and under the per-row headroom contract the
    ONE double division computes it exactly:

    * ``2t + d`` exact: needs ``t < 2^52``;
    * ``floor`` lands right: the quotient's distance to the nearest
      integer is either 0 (then the division of exactly-divisible
      int64s < 2^53 is exact) or >= 1/(2d), and 1/(2d) beats the
      division's half-ulp ``~q*2^-53`` whenever ``q*d ~ t < 2^50``.

    So the contract is ``|num| * 10^k < 2^50`` (den > 0) — per-row
    counts scaled by 10^6 sit orders of magnitude inside it; bigger
    numerators (aggregate sums, the quality composite) use
    :func:`round_div` / :func:`scaled_round_half` instead. Each
    operand is referenced ~2x and there is NO conditional around the
    arithmetic — both properties matter: Catalyst re-inlines projected
    expressions into pushed-down filters, so a rounding chain that
    referenced its operands ~50x (the first r12 formulation) turned
    gated per-row ratios into 2-3x query regressions.

    The oracle side of a site using this must replay
    :func:`round_div_sql` (duckdb dialect) over the same integer
    num/den — identical mathematical function wherever both headroom
    contracts hold. For a WHERE gate on the rounded value, use
    :func:`ratio_ge` (pure integer predicate, single operand refs)
    rather than comparing this column.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    x = F.abs(num.cast("bigint")) * F.lit(10**k).cast("bigint")
    d = den.cast("bigint")
    q = F.floor(
        (F.lit(2).cast("bigint") * x + d).cast("double")
        / (F.lit(2).cast("bigint") * d).cast("double")
    ).cast("bigint")
    sgn = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    return (sgn * q).cast("double") / F.lit(float(10**k))


def ratio_ge(num: Column, den: Column, k: int, threshold: float) -> Column:
    """Predicate ``ROUND(num/den, k) >= threshold`` in PURE INTEGER
    arithmetic — algebraically identical to gating on
    :func:`round_ratio`'s output, but each operand is referenced ONCE,
    so when Catalyst pushes the filter below the projection and
    re-inlines the expression, nothing expensive is duplicated.

    Derivation (den > 0, T6 = threshold*10^k exact): round-half-away
    of v = num/den at k decimals is >= threshold iff
    ``v*10^k >= T6 - 1/2`` iff ``2*num*10^k >= (2*T6 - 1)*den``.
    Headroom: ``2*|num|*10^k < 2^63``.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    t6 = round(threshold * 10**k)
    if abs(t6 - threshold * 10**k) > 1e-9:
        raise ValueError(f"threshold {threshold} is not on the 10^-{k} grid")
    lhs = F.lit(2).cast("bigint") * num.cast("bigint") * F.lit(10**k).cast("bigint")
    return lhs >= F.lit(2 * t6 - 1).cast("bigint") * den.cast("bigint")
