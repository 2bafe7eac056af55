"""Data profiling + quality gates — the Deequ/Great-Expectations slice
a training-data pipeline runs before anything else touches a new drop:
per-column statistics to understand the data, and declarative
constraint checks that gate ingestion.

Both are single-pass aggregates: profiling computes every metric for
every column in ONE scan (the aggregate expressions ride together, so
profiling 50 columns of 100 TB costs one pass, not 50), and the check
report is one conditional-count aggregate per rule fused into a single
scan-side projection. No UDFs, no collects.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from easydb_server_spark.functions.exactround import round_ratio, scaled_round_half


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile: row count, null count/rate, exact distinct
    count, and min/max rendered as strings (so one result schema fits
    every column type). One aggregation job for all columns — the row
    count rides the same aggregate as a ``count(1)`` slot rather than
    a separate ``df.count()`` job, so profiling 100 TB costs ONE scan,
    not two.

    At real scale the exact ``countDistinct`` per column becomes
    ``approx_count_distinct`` (the HLL trade already measured for
    ``agg_approx_distinct``); exact is kept here because it is what an
    engine-independent oracle can replay.
    """
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            # coalesce: SUM over an EMPTY table is NULL in Spark while
            # the SQL-count form (COUNT(*) - COUNT(col)) an oracle
            # writes is 0 — an empty snapshot must profile as zero
            # nulls / zero rate, not NaN (caught by the regeneration
            # differential when a generated corpus left q_profile_drift's
            # candidate half empty)
            F.coalesce(F.sum(F.when(col.isNull(), 1).otherwise(0)), F.lit(0)).alias(
                f"_null_{c}"
            ),
            F.countDistinct(col).alias(f"_dist_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_null_{c}").cast("long").alias("n_null"),
                F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        row.select(F.col("_n_rows").cast("long").alias("n_rows"), F.explode(per_col).alias("p"))
        .select(
            F.col("p.column").alias("column"),
            "n_rows",
            F.col("p.n_null").alias("n_null"),
            F.col("p.n_distinct").alias("n_distinct"),
            F.col("p.min_value").alias("min_value"),
            F.col("p.max_value").alias("max_value"),
        )
        .select(
            "column",
            "n_rows",
            "n_null",
            # n_null/n is a count rational: round it in exact INT64
            # (functions/exactround) — ROUND(double, 6) tie-breaks
            # 6-decimal midpoints differently on Spark vs DuckDB.
            # Column form, not the chunked round_div F.expr text: the
            # single 10^6 multiply is safe for counts < 9.2e12, and
            # parsing the ~2 KB chunked SQL per query build cost a
            # measured 0.19 s of DRIVER time (BENCH r12:
            # profile_documents x1.63; the oracle keeps the chunked
            # replay — same function, no parse-cost concern in a
            # static module constant).
            (
                scaled_round_half(
                    F.col("n_null").cast("bigint") * F.lit(10**6).cast("bigint"),
                    F.greatest(F.col("n_rows"), F.lit(1)).cast("bigint"),
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("null_rate"),
            "n_distinct",
            "min_value",
            "max_value",
        )
    )


def quality_checks(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Declarative ingestion gate: each rule is (name, SQL predicate
    that every row MUST satisfy); the report counts violations per
    rule and flags passed = (violations == 0). A row whose predicate
    evaluates to NULL counts as a violation (the strict reading: the
    row did not satisfy the rule). All rules evaluate in one scan —
    each is a conditional count fused into a single aggregate — so
    gating 100 TB costs one pass regardless of how many rules are
    declared.
    """
    aggs = [
        F.sum(F.when(F.expr(pred), 0).otherwise(1)).cast("long").alias(f"_v_{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    row = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.lit(pred).alias("predicate"),
                F.col(f"_v_{i}").alias("n_violations"),
            )
            for i, (name, pred) in enumerate(rules)
        ]
    )
    return (
        row.select(F.explode(per_rule).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.predicate").alias("predicate"),
            F.col("r.n_violations").alias("n_violations"),
            (F.col("r.n_violations") == 0).alias("passed"),
        )
    )


def profile_drift(
    reference: DataFrame,
    candidate: DataFrame,
    cols: list[str],
    max_null_rate_increase: float = 0.05,
    max_distinct_ratio_change: float = 0.5,
) -> DataFrame:
    """Snapshot-to-snapshot drift report — the monitoring step between
    profiling and gating: compare a new drop's per-column profile
    against the reference corpus and flag columns whose null rate
    jumped or whose distinct-count density changed beyond tolerance
    (schema rot, upstream format changes, silent truncation).

    Two one-pass profiles + a |cols|-row join; nothing here scales
    with data beyond the two profile scans.
    """
    ref = profile_table(reference, cols).select(
        "column",
        F.col("null_rate").alias("ref_null_rate"),
        F.col("n_distinct").alias("_dr"),
        F.greatest(F.col("n_rows"), F.lit(1)).alias("_nr"),
    )
    cand = profile_table(candidate, cols).select(
        "column",
        F.col("null_rate").alias("cand_null_rate"),
        F.col("n_distinct").alias("_dc"),
        F.greatest(F.col("n_rows"), F.lit(1)).alias("_nc"),
    )
    # difference of two already-grid doubles is never an exact
    # 6-decimal midpoint as a rational, so plain ROUND is portable
    null_jump = F.round(F.col("cand_null_rate") - F.col("ref_null_rate"), 6)
    # |dc/nc - dr/nr| / (dr/nr) == |dc*nr - dr*nc| / (nc*dr): a pure
    # count rational -> round it in exact INT64 (functions/exactround);
    # dr = 0 falls back to the 1e-12-guard double formula (values are
    # ~1e12 x density, nowhere near a rounding boundary)
    density_change = F.when(
        F.col("_dr") > 0,
        round_ratio(
            F.abs(F.col("_dc") * F.col("_nr") - F.col("_dr") * F.col("_nc")),
            F.col("_nc") * F.col("_dr"),
            6,
        ),
    ).otherwise(
        F.round(
            F.abs(
                F.col("_dc") / F.col("_nc").cast("double")
                - F.col("_dr") / F.col("_nr").cast("double")
            )
            / F.lit(1e-12),
            6,
        )
    )
    return ref.join(cand, "column").select(
        "column",
        "ref_null_rate",
        "cand_null_rate",
        null_jump.alias("null_rate_increase"),
        density_change.alias("distinct_density_change"),
        (
            (null_jump <= max_null_rate_increase)
            & (density_change <= max_distinct_ratio_change)
        ).alias("ok"),
    )


def bucket_anomalies(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    bucket: str = "1 hour",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Temporal volume-anomaly detection — the monitoring dual of
    :func:`profile_drift`: bucket events per (group, time window),
    z-score each bucket's count against ITS group's distribution over
    observed buckets, and flag |z| >= threshold (traffic spikes,
    ingestion gaps, bot bursts). Returns one row per (group, bucket):
    (grp, window_start, n, z, is_anomaly).

    Determinism contract: mean/variance are computed from EXACT
    integer sums (sum n, sum n^2, bucket count) in one fixed float
    expression — never Spark's incremental ``stddev`` aggregate,
    whose partition-order-dependent accumulation would diverge across
    engines and runs. z rounds to 6 dp; sd = 0 (constant traffic)
    yields z = 0.

    Scale shape: one (group, bucket) count aggregation (map-side
    combinable), one group-width stats aggregation, one broadcast
    join back — the corpus shuffles (group, bucket) pairs once.
    """
    counts = df.groupBy(
        F.col(group_col).alias("grp"),
        F.window(ts_col, bucket)["start"].alias("window_start"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.groupBy("grp").agg(
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_nn"),
        F.count(F.lit(1)).alias("k"),
    )
    mu = F.col("sum_n").cast("double") / F.col("k")
    var = (
        F.col("sum_nn") - F.col("sum_n") * F.col("sum_n") / F.col("k").cast("double")
    ) / F.col("k")
    sd = F.sqrt(var)
    z = F.when(sd == 0, F.lit(0.0)).otherwise(
        F.round((F.col("n") - mu) / sd, 6)
    )
    return counts.join(F.broadcast(stats), "grp").select(
        "grp",
        F.col("window_start").cast("string").alias("window_start"),
        "n",
        z.alias("z"),
        (F.abs(z) >= F.lit(z_threshold)).alias("is_anomaly"),
    )
