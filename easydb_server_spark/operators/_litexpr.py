"""SQL-text builders for the literal (driver-known constant) forms of
the ANN/PQ operators.

Why text: the zero-exchange literal formulations (kmeans-style
argmax-over-literal-centroids — operators/kmeans.py,
operators/similarity.py, operators/pq.py) eliminate executor work, at
which point PLAN CONSTRUCTION becomes the measured bottleneck:
building the nested transform/aggregate lambdas through the Column API
costs one py4j round-trip per operator node (~0.9 s for one PQ encode
expression at m=4, k=8 — measured r16), while rendering the same
expression as ONE SQL string and parsing it with ``F.expr`` is a
single JVM call (~10 ms). The parsed expression tree is identical, so
results are bit-for-bit the Column form's.

Float literals render via ``repr(float)`` — the shortest decimal that
round-trips to the same IEEE double, which Spark's SQL parser
(``java.lang.Double.parseDouble``) maps back to the identical bits —
with a ``D`` suffix so the parser never routes through DECIMAL.
"""

from __future__ import annotations


def sql_d(x: float) -> str:
    """Exact double literal."""
    r = repr(float(x))
    # repr of inf/nan would not parse; finite contract is the caller's
    return f"{r}D"


def sql_arr_d(vec: list[float]) -> str:
    return "array(" + ",".join(sql_d(v) for v in vec) + ")"


def sql_arr_l(vals: list[int]) -> str:
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def sql_scalar(v, type_name: str) -> str:
    """Literal of an id-typed value (int family or string)."""
    if type_name in ("tinyint", "smallint", "int"):
        return f"CAST({int(v)} AS {type_name.upper()})"
    if type_name == "bigint":
        return f"{int(v)}L"
    if type_name == "string":
        escaped = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    raise ValueError(f"unsupported literal id type: {type_name}")


def supported_id_type(type_name: str) -> bool:
    return type_name in ("tinyint", "smallint", "int", "bigint", "string")


def dot_sql(vec_sql: str, cent: list[float]) -> str:
    """The `_dot` fold (zip_with multiply + sequential left-fold sum)
    against a literal vector — identical op order, so identical
    floats."""
    return (
        f"aggregate(zip_with({vec_sql}, {sql_arr_d(cent)}, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )


def sim_sql(vec_sql: str, cent: list[float]) -> str:
    """round(dot, 6) with +0.0 normalization (a -0.0/+0.0 pair must
    tie exactly as a sort-based order ties it)."""
    return f"(round({dot_sql(vec_sql, cent)}, 6) + 0.0D)"


def argmax_sql(cand_sql: str, struct_fields_sql: str) -> str:
    """Fold argmax over an array<struct<sim, ...>> whose candidates
    are emitted in ascending tie-break order: strict > keeps the
    accumulator on ties, which IS the smaller-id tie-break. The init
    is -Infinity so the first candidate always wins it (sims of finite
    vectors are finite)."""
    init = f"named_struct('sim', CAST('-Infinity' AS DOUBLE), {struct_fields_sql})"
    return f"aggregate({cand_sql}, {init}, (acc, x) -> if(x.sim > acc.sim, x, acc))"


def topn_cells_sql(cand_sql: str, top: int) -> str:
    """slice(array_sort by (sim desc, cell asc), 1, top) over
    candidate structs<sim, cell> — the window (desc, asc) order as an
    in-row comparator (IEEE comparisons: ±0.0 compare equal and fall
    through to the cell tie-break)."""
    cmp = (
        "(l, r) -> case when l.sim > r.sim then -1 when l.sim < r.sim then 1 "
        "when l.cell < r.cell then -1 when l.cell > r.cell then 1 else 0 end"
    )
    return f"slice(array_sort({cand_sql}, {cmp}), 1, {top})"


def cell_cand_sql(vec_sql: str, rows: list, cell_type: str) -> str:
    """array<struct<sim, cell>> of rounded-dot candidates, one per
    centroid, in cell-ascending order (rows must be pre-sorted)."""
    return (
        "array("
        + ",".join(
            f"named_struct('sim', {sim_sql(vec_sql, cent)}, "
            f"'cell', {sql_scalar(cell, cell_type)})"
            for cell, cent in rows
        )
        + ")"
    )


def as_double_sql(col_name: str) -> str:
    """The `_as_double` transform (element-wise cast to double) as
    SQL."""
    return f"transform({col_name}, x -> double(x))"


def lut_units_sql(cb: list[list[list[float]]], width: int, vec_sql: str) -> str:
    """array<bigint> of m*k ADC LUT entries (index sub*k + code):
    ``CAST(round(dot(q_sub, centroid) * 1e6, 0) AS BIGINT)`` — the
    exact expression the broadcast-join LUT computes per row."""
    parts = []
    for sub, cents in enumerate(cb):
        svec = f"slice({vec_sql}, {sub * width + 1}, {width})"
        for cent in cents:
            parts.append(
                f"CAST(round({dot_sql(svec, cent)} * 1000000.0D, 0) AS BIGINT)"
            )
    return "array(" + ",".join(parts) + ")"


def codes_sql(cb: list[list[list[float]]], width: int, vec_sql: str) -> str:
    """array<int> of m nearest codes (rounded-dot argmax per subspace,
    ties to the smaller code) — the `_nearest_code` rule as one
    in-row expression against the literal codebook."""
    outs = []
    for sub, cents in enumerate(cb):
        svec = f"slice({vec_sql}, {sub * width + 1}, {width})"
        cand = (
            "array("
            + ",".join(
                f"named_struct('sim', {sim_sql(svec, cent)}, 'code', {code})"
                for code, cent in enumerate(cents)
            )
            + ")"
        )
        outs.append(argmax_sql(cand, "'code', CAST(-1 AS INT)") + ".code")
    return "array(" + ",".join(outs) + ")"
