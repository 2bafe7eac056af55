"""Driver-regeneration simulator: the per-round correctness gate runs
over FRESHLY GENERATED parquet every round, so "green on today's
fixtures" is weaker than "green on any fixtures". This test generates
adversarial random documents/embeddings tables — word counts biased
onto the 2^7·5^j midpoint-denominator class, embedding values tuned so
covariance cells brush 5-decimal boundaries — and runs the r12
rewritten comparator entries Spark-vs-DuckDB over each dataset.

This is the registry-level closure of the exactround fix: the unit
tests prove the PRIMITIVES tie-break identically; this proves the
assembled entries do, on data the repo has never seen.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from easydb_server_spark.compare import canon_frame
from easydb_server_spark.queries import REGISTRY

# r13 (verdict ask #7): the fuzzed set is DERIVED, not hand-listed —
# every oracled entry whose tables are documents/embeddings only and
# whose oracle contains a division is a midpoint-class candidate the
# driver's per-round regeneration could flip. New entries that divide
# join the differential automatically.
_OTHER_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events",
)


def _division_entries() -> list[str]:
    import re

    out = []
    for name, (_fn, oracle) in REGISTRY.items():
        if oracle is None:
            continue
        low = oracle.lower()
        if any(re.search(rf"\b(from|join)\s+{t}\b", low) for t in _OTHER_TABLES):
            continue  # needs fixtures this generator does not produce
        if "/" in oracle:
            out.append(name)
    return out


ENTRIES = _division_entries()

# the r12 hand-audited rewrite set must stay a subset of the derived
# one — if derivation ever drops one of these, the differential lost
# coverage silently
_R12_CORE = {
    "emb_covariance", "text_quality", "text_token_counts",
    "text_repetition", "text_code_fraction", "text_length_histogram",
    "dedup_ngram_jaccard", "profile_documents", "text_ngram_novelty",
}
assert _R12_CORE <= set(ENTRIES), sorted(_R12_CORE - set(ENTRIES))

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "the", "to",
         "of", "and", "code", "def", "x", "ya", "lorem"]


def _gen_documents(rng: np.random.RandomState, n_docs: int):
    rows = []
    # word counts biased onto midpoint-prone denominators: exact
    # multiples of 128/640/3200 land n/d ratios on 6-decimal midpoints
    # whenever the numerator keeps the reduced denominator 2^7*5^j
    danger = [128, 256, 384, 640, 128, 64, 200]
    for i in range(n_docs):
        if rng.rand() < 0.6:
            nw = danger[rng.randint(len(danger))]
        else:
            nw = int(rng.randint(5, 400))
        words = [WORDS[rng.randint(len(WORDS))] for _ in range(nw)]
        # inject duplicate runs so dup-word numerators are odd often
        if rng.rand() < 0.5 and nw > 4:
            words[1 : 1 + nw // 4] = [words[0]] * (nw // 4)
        text = " ".join(words)
        rows.append(
            (i, text, ["en", "de", "fr"][i % 3], f"src{i % 4}", len(text))
        )
    return rows


def _gen_embeddings(rng: np.random.RandomState, n: int, d: int = 64):
    # d matches the driver fixture geometry: the PQ/IVFADC oracles
    # replay 4x16 subspace slices, i.e. they assume the fixture's
    # 64-wide vectors (as the driver's regeneration always produces)
    # values on a coarse grid make quantized covariance sums land on
    # exact 5-decimal midpoints far more often than uniform doubles
    vals = rng.randint(-40, 41, size=(n, d)) / 40.0
    return [(i, [float(x) for x in vals[i]], int(i % 3)) for i in range(n)]


@pytest.mark.parametrize("seed", [11, 23])
def test_rewritten_entries_survive_regenerated_data(spark, tmp_path, seed):
    rng = np.random.RandomState(seed)
    # 300 docs: q_profile_drift splits ref/cand at doc_id 250, so both
    # halves must be populated (the 150-doc first cut left the
    # candidate EMPTY — which caught profile_table's NULL-sum-vs-0
    # empty-input divergence, now fixed and locked separately)
    docs = _gen_documents(rng, 300)
    embs = _gen_embeddings(rng, 60)

    sf = str(tmp_path / f"regen_{seed}")
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(2).write.parquet(f"{sf}/documents.parquet")
    spark.createDataFrame(
        embs, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(2).write.parquet(f"{sf}/embeddings.parquet")

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    for name in ENTRIES:
        fn, oracle = REGISTRY[name]
        got = canon_frame(fn(spark, sf).toPandas())
        want = canon_frame(con.execute(oracle).df())
        assert got == want, f"{name} diverges on regenerated data (seed {seed})"


def test_generator_produces_midpoint_ratios():
    """Teeth: the adversarial data must actually contain ratios that
    sit EXACTLY on 6-decimal midpoints (reduced denominator 2^7*5^j,
    odd numerator) — otherwise the differential proves nothing about
    the tie-break class."""
    from fractions import Fraction

    rng = np.random.RandomState(11)
    docs = _gen_documents(rng, 150)
    hits = 0
    for _i, text, _l, _s, _n in docs:
        ws = text.split(" ")
        nw = len(ws)
        dup = nw - len(set(ws))
        for num in (dup, len(set(ws))):
            if 0 < num and nw > 0:
                fr = Fraction(num * 10**6, nw)
                # exact midpoint: fr == m + 1/2 for integer m
                if fr.denominator == 2:
                    hits += 1
    assert hits >= 3, f"only {hits} midpoint ratios generated — rebias the generator"


TPCH_ENTRIES = ["agg_pricing_summary", "tpch_q1", "tpch_q14", "tpch_q17", "join_nonequi"]


def _gen_lineitem(rng: np.random.RandomState, n: int):
    """Adversarial money rows: group sizes biased so avg denominators
    (count*100) reduce onto the midpoint class, quantities/prices on
    the cent grid with odd numerators frequent."""
    import datetime

    rows = []
    flags = ["A", "N", "R"]
    stats = ["F", "O"]
    for i in range(n):
        qty = float(rng.randint(1, 51))
        # prices with odd cent counts half the time
        price = rng.randint(90000, 110000) / 100.0
        if rng.rand() < 0.5:
            price += 0.01
        disc = rng.randint(0, 11) / 100.0
        tax = rng.randint(0, 9) / 100.0
        ship = datetime.datetime(1996 + int(rng.randint(0, 3)), 1 + int(rng.randint(0, 12)), 1 + int(rng.randint(0, 28)))
        rows.append(
            (i, int(rng.randint(0, 40)), int(rng.randint(0, 10)), 1, qty, price,
             disc, tax, flags[i % 3], stats[i % 2], ship)
        )
    return rows


def _gen_part(rng: np.random.RandomState, n: int):
    types = ["PROMO", "STANDARD", "ECONOMY"]
    return [
        (
            i,
            f"part {i}",
            f"Brand#{(i % 5) * 10 + 3}",
            types[i % 3],
            int(rng.randint(1, 50)),
            rng.randint(90000, 99999) / 100.0,
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("seed", [7, 31])
def test_tpch_money_entries_survive_regenerated_data(spark, tmp_path, seed):
    """The decimal-money comparator rewrites (exactround on avg/%/cost
    columns) against freshly generated lineitem/part — group counts of
    8/16/32 rows make count*100 denominators midpoint-capable."""
    rng = np.random.RandomState(seed)
    li = _gen_lineitem(rng, 256)  # 3 flags x 2 statuses -> groups ~42 rows
    pt = _gen_part(rng, 40)

    sf = str(tmp_path / f"tpch_{seed}")
    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(2).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        pt,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(f"{sf}/part.parquet")

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    for name in TPCH_ENTRIES:
        fn, oracle = REGISTRY[name]
        got = canon_frame(fn(spark, sf).toPandas())
        want = canon_frame(con.execute(oracle).df())
        assert got == want, f"{name} diverges on regenerated data (seed {seed})"


# ---- events-table differential (r13): the ts_*/window/gate entries ----

# streaming entries run real micro-batches (~10 s each) and have their
# own batch≡stream + recovery locks; everything else events-only joins
_EVENTS_EXCLUDE = {
    "stream_dedup", "stream_join", "stream_tumbling",
    "stream_sliding", "stream_session",
}


def _events_entries() -> list[str]:
    import re

    non_events = [t for t in _OTHER_TABLES if t != "events"] + [
        "documents",
        "embeddings",
    ]
    out = []
    for name, (_fn, oracle) in REGISTRY.items():
        if oracle is None or name in _EVENTS_EXCLUDE:
            continue
        low = oracle.lower()
        if not re.search(r"\b(from|join)\s+events\b", low):
            continue
        if any(re.search(rf"\b(from|join)\s+{t}\b", low) for t in non_events):
            continue
        out.append(name)
    return out


def _gen_events(rng: np.random.RandomState, n: int):
    """Adversarial-but-plausible events: timestamps biased onto EXACT
    window boundaries (hour/minute edges — tumbling/session/rollup tie
    points), ±1 µs straddles, and exact-duplicate instants (rank/dedup
    ties); gaps stay >= 1 s (the fixture's cadence class — the interp
    denominators keep their documented huge-den shape)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "signup", "error", "exotic"]
    rows = []
    t = base
    for i in range(n):
        r = rng.rand()
        if r < 0.25:  # exact hour/minute boundary
            t = base + datetime.timedelta(
                hours=int(rng.randint(0, 72)),
                minutes=int(rng.randint(0, 2)) * 30,
            )
        elif r < 0.35:  # straddle a boundary by 1 microsecond
            edge = base + datetime.timedelta(hours=int(rng.randint(0, 72)))
            t = edge + datetime.timedelta(microseconds=int(rng.choice([-1, 0, 1])))
        elif r < 0.45 and rows:  # exact duplicate instant
            t = rows[-1][1]
        else:
            t = t + datetime.timedelta(seconds=int(rng.randint(1, 400)))
        rows.append(
            (
                i,
                t,
                int(rng.randint(-2, 60)),  # a few negatives: gate violations
                types[int(rng.randint(0, len(types)))],
                float(rng.randint(-100, 10000)) / 100.0,
                '{"k": %d}' % int(rng.randint(0, 100)),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [5, 17])
def test_events_entries_survive_regenerated_data(spark, tmp_path, seed):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    rng = np.random.RandomState(seed)
    rows = _gen_events(rng, 2000)
    sf = str(tmp_path / f"ev_{seed}")
    # naive microsecond timestamps — the fixture's logical shape
    # (isAdjustedToUTC=false), which load() normalizes via
    # normalize_event_ts and DuckDB reads as plain TIMESTAMP
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    import os

    os.makedirs(f"{sf}/events.parquet", exist_ok=True)
    pq_.write_table(table, f"{sf}/events.parquet/part-0.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    entries = _events_entries()
    assert {"ts_tumbling", "ts_session_window", "ts_resample_interp",
            "quality_gate_events", "ts_asof_join"} <= set(entries)
    for name in entries:
        fn, oracle = REGISTRY[name]
        got = canon_frame(fn(spark, sf).toPandas())
        want = canon_frame(con.execute(oracle).df())
        assert got == want, f"{name} diverges on regenerated events (seed {seed})"
