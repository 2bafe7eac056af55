"""Skew-mitigation operators: salted joins and salted aggregation.

AQE's skew-join splitting handles most skew automatically; explicit
salting is the tool when (a) AQE can't see the skew (e.g. it appears
after a UDF/explode), or (b) an aggregation hot-key overwhelms a
single reducer. Both operators here are semantics-preserving — the
conformance query checks a salted join against the plain-join oracle.

Mechanics at 100 TB: the skewed (large) side gets a deterministic salt
in [0, n); the small/replicated side is exploded n× so every salted
key still finds its match. The shuffle spreads each hot key over n
reducers at the cost of replicating the other side n× — the classic
trade, worth it when one key holds >1/n of the data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _salt_col(n_salts: int, seed: int) -> F.Column:
    """Per-row independent salt in [0, n_salts): ``rand(seed)`` —
    deterministic for a fixed seed + partitioning, but NOT a function
    of row content, so byte-identical duplicate rows (the common hot
    key) spread across all reducers."""
    return F.floor(F.rand(seed) * n_salts).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 7,
) -> DataFrame:
    """Equi-join with the large side salted and the small side
    replicated n_salts×. Result is row-identical to ``large.join(small,
    on, how)`` for inner/left joins.

    The salt is per-row independent (``rand(seed)``), NOT a hash of the
    row's columns: hashing all columns sends byte-identical duplicate
    rows — the common shape of a hot key — to the same reducer, which
    defeats the salting. rand spreads duplicates uniformly."""
    salted_large = large.withColumn("_salt", _salt_col(n_salts, seed))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_large.join(replicated_small, [on, "_salt"], how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    n_salts: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Two-level aggregation for hot grouping keys: partial aggregate
    on (key, salt), then final aggregate on key.

    ``agg_exprs`` maps output column → one of sum/count/min/max
    (the re-aggregatable algebra: count re-aggregates as sum).
    """
    partial_aggs = []
    final_aggs = []
    for out_col, kind in agg_exprs.items():
        if kind == "count":
            partial_aggs.append(F.count("*").alias(f"_p_{out_col}"))
            final_aggs.append(F.sum(f"_p_{out_col}").alias(out_col))
        elif kind.startswith(("sum:", "min:", "max:")):
            fn_name, src = kind.split(":", 1)
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[fn_name]
            partial_aggs.append(fn(src).alias(f"_p_{out_col}"))
            final_fn = F.sum if fn_name == "sum" else fn
            final_aggs.append(final_fn(f"_p_{out_col}").alias(out_col))
        else:
            raise ValueError(f"unsupported agg kind: {kind!r}")
    salted = df.withColumn("_salt", _salt_col(n_salts, seed))
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)
