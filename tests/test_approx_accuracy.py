"""Quantified accuracy bounds for the approximate aggregates.

`agg_approx_distinct` is rows-only at the driver (HLL sketch values
are engine-specific, so no DuckDB oracle), which proves it *runs* but
not that it *approximates*. HyperLogLog++ at relative standard
deviation `rsd` has estimate error that is approximately normal, so
|approx − exact| ≤ 3·rsd·exact holds with probability ≈ 0.997 per
group — on this fixed, deterministic input it either holds or the
sketch is misconfigured.
"""

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

RSD = 0.01  # must match q_agg_approx_distinct


def test_approx_count_distinct_within_three_sigma(spark):
    from easydb_server_spark.queries.aggregates import q_agg_approx_distinct

    approx = {r.l_returnflag: r.approx_orders for r in q_agg_approx_distinct(spark, SF_DIR).collect()}
    exact = {
        r.l_returnflag: r.exact
        for r in (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg(F.count_distinct("l_orderkey").alias("exact"))
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for flag, ex in exact.items():
        bound = 3 * RSD * ex
        assert abs(approx[flag] - ex) <= bound, (
            f"group {flag!r}: approx {approx[flag]} vs exact {ex} "
            f"exceeds 3·rsd bound {bound:.1f}"
        )
