"""Round-11 regression locks.

The r10 verdict's one red row was ``emb_covariance``: float Gram
partials summed in partition-arrival order, then the catastrophic-
cancellation form ``G − n·μμ'``, then ROUND(…,5) — a coin flip at
rounding boundaries across partitionings. The rewrite follows the
repo's own fixed-point discipline (PageRank / ts_anomaly): exact INT64
means, per-row quantized centered products, one float division at the
end. These tests pin the determinism contract directly on the
operator; the registry-wide sweep
(test_registry.test_float_emitting_entries_are_repartition_invariant)
covers the query-level form of this plus every other float-emitting
entry.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


class TestEmbCovarianceDeterminism:
    def test_repartition_invariance(self, spark):
        """canon_frame equality between repartition(1) and
        repartition(32) runs — the r10 verdict's 'Done' criterion."""
        from easydb_server_spark.compare import canon_frame
        from easydb_server_spark.operators.similarity import emb_covariance
        from easydb_server_spark.queries._util import load

        e = load(spark, SF_DIR, "embeddings")
        frames = [
            canon_frame(emb_covariance(e.repartition(k), "embedding").toPandas())
            for k in (1, 32)
        ]
        assert frames[0] == frames[1]

    def test_repeated_runs_are_bit_identical(self, spark):
        """Same partitioning, two executions: partition-arrival order
        varies run to run, the result must not."""
        from easydb_server_spark.compare import canon_frame
        from easydb_server_spark.operators.similarity import emb_covariance
        from easydb_server_spark.queries._util import load

        e = load(spark, SF_DIR, "embeddings").repartition(16)
        a = canon_frame(emb_covariance(e, "embedding").toPandas())
        b = canon_frame(emb_covariance(e, "embedding").toPandas())
        assert a == b

    def test_quantization_error_is_below_output_rounding(self, spark):
        """The fixed-point result stays within 2/prod_scale of the
        float covariance — far inside the ROUND(…,5) granularity the
        driver compares at."""
        import numpy as np

        from easydb_server_spark.operators.similarity import emb_covariance

        rng = np.random.default_rng(7)
        x = rng.normal(size=(400, 6))
        rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {(r.i, r.j): r.cov for r in emb_covariance(df, "embedding").collect()}
        want = np.cov(x, rowvar=False, ddof=1)
        for (i, j), v in got.items():
            assert v == pytest.approx(want[i][j], abs=2e-5)

    def test_empty_corpus_yields_empty_matrix(self, spark):
        from easydb_server_spark.operators.similarity import emb_covariance

        df = spark.createDataFrame([], "vec_id long, embedding array<double>")
        assert emb_covariance(df, "embedding").count() == 0
