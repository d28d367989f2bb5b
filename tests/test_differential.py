"""Randomized differential testing (sqllogictest-style): generate seeded
random queries in the SQL dialect subset Spark and DuckDB share, run the
SAME text on both engines over the same parquet tables, and require
identical results.

This complements the hand-written oracle pairs: those pin the operators
we ship; this sweeps the composition space (filter x group x agg x join
x order/limit) for dialect or planner divergences we didn't think to
write down.  Constraints that keep the subset engine-identical:

- arithmetic and aggregation stay on exact integers (keys, line numbers,
  and cents via CAST(ROUND(x*100) AS BIGINT));
- string predicates use only =, <>, IN, LIKE with literal patterns;
- every ORDER BY ends with a unique key so LIMIT is deterministic;
- aggregates are COUNT/SUM/MIN/MAX over those integers.

The generator is seeded: failures reproduce by case index.
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from tests.conftest import SF_DIR

N_CASES = 200
SEED = 20260813

NUM_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]
CENTS = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"

STR_DOMAIN = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
}


def _predicate(rng: random.Random) -> str:
    kind = rng.choice(["num_cmp", "str_eq", "str_in", "str_like", "and", "or"])
    if kind == "num_cmp":
        col = rng.choice(NUM_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        val = rng.choice([1, 2, 7, 100, 5000, 77777])
        return f"{col} {op} {val}"
    if kind == "str_eq":
        col = rng.choice(STR_COLS)
        return f"{col} = '{rng.choice(STR_DOMAIN[col])}'"
    if kind == "str_in":
        col = rng.choice(STR_COLS)
        vals = rng.sample(STR_DOMAIN[col], k=min(2, len(STR_DOMAIN[col])))
        inlist = ", ".join(f"'{v}'" for v in vals)
        return f"{col} IN ({inlist})"
    if kind == "str_like":
        col = rng.choice(STR_COLS)
        return f"{col} LIKE '{rng.choice(STR_DOMAIN[col])[0]}%'"
    sub = f"({_predicate(rng)}) {'AND' if kind == 'and' else 'OR'} ({_predicate(rng)})"
    return sub


def _agg_query(rng: random.Random) -> str:
    keys = rng.sample(STR_COLS, k=rng.choice([1, 2]))
    aggs = rng.sample(
        [
            "COUNT(*) AS n",
            "SUM(l_orderkey) AS sum_ok",
            f"SUM({CENTS}) AS sum_cents",
            "MIN(l_orderkey) AS min_ok",
            "MAX(l_linenumber) AS max_ln",
            "COUNT(DISTINCT l_suppkey) AS n_supp",
        ],
        k=rng.choice([1, 2, 3]),
    )
    where = _predicate(rng)
    return (
        f"SELECT {', '.join(keys)}, {', '.join(aggs)} FROM lineitem "
        f"WHERE {where} GROUP BY {', '.join(keys)}"
    )


def _scan_query(rng: random.Random) -> str:
    cols = rng.sample(NUM_COLS + STR_COLS, k=rng.choice([2, 3]))
    where = _predicate(rng)
    order = ", ".join(cols) + ", l_orderkey, l_linenumber"
    limit = rng.choice([7, 50, 200])
    return (
        f"SELECT {', '.join(cols)} FROM lineitem WHERE {where} "
        f"ORDER BY {order} LIMIT {limit}"
    )


def _join_query(rng: random.Random) -> str:
    where = _predicate(rng)
    agg = rng.choice(["COUNT(*) AS n", "SUM(l.l_linenumber) AS sum_ln"])
    return (
        "SELECT o.o_orderstatus, "
        f"{agg} FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        f"WHERE {where} GROUP BY o.o_orderstatus"
    )


def _window_query(rng: random.Random) -> str:
    part = rng.choice(STR_COLS)
    func = rng.choice(
        [
            "ROW_NUMBER()",
            "RANK()",
            "DENSE_RANK()",
            "SUM(l_linenumber)",
            "MIN(l_orderkey)",
        ]
    )
    # deterministic frame: full ordering by unique key inside the partition
    win = f"OVER (PARTITION BY {part} ORDER BY l_orderkey, l_linenumber)"
    where = _predicate(rng)
    limit = rng.choice([50, 200])
    return (
        f"SELECT l_orderkey, l_linenumber, {part}, {func} {win} AS wv "
        f"FROM lineitem WHERE {where} "
        # wv tail: duplicate (orderkey, linenumber) rows are fully tied on
        # the data columns, so only wv makes the ordering (and LIMIT) unique
        f"ORDER BY {part}, l_orderkey, l_linenumber, wv LIMIT {limit}"
    )


def _having_query(rng: random.Random) -> str:
    key = rng.choice(STR_COLS)
    where = _predicate(rng)
    hcut = rng.choice([10, 100, 1000])
    return (
        f"SELECT {key}, COUNT(*) AS n, MIN(l_orderkey) AS min_ok FROM lineitem "
        f"WHERE {where} GROUP BY {key} HAVING COUNT(*) > {hcut}"
    )


def _setop_query(rng: random.Random) -> str:
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    cols = ", ".join(rng.sample(NUM_COLS + STR_COLS, k=2))
    p1, p2 = _predicate(rng), _predicate(rng)
    return (
        f"SELECT {cols} FROM lineitem WHERE {p1} "
        f"{op} "
        f"SELECT {cols} FROM lineitem WHERE {p2}"
    )


def _case_query(rng: random.Random) -> str:
    col = rng.choice(NUM_COLS)
    cut1, cut2 = sorted(rng.sample([10, 100, 1000, 10000], k=2))
    where = _predicate(rng)
    return (
        f"SELECT CASE WHEN {col} < {cut1} THEN 'lo' "
        f"WHEN {col} < {cut2} THEN 'mid' ELSE 'hi' END AS band, "
        f"COUNT(*) AS n, SUM(l_linenumber) AS sum_ln "
        f"FROM lineitem WHERE {where} GROUP BY 1"
    )


def _distinct_query(rng: random.Random) -> str:
    cols = ", ".join(rng.sample(STR_COLS + ["l_linenumber"], k=2))
    where = _predicate(rng)
    return f"SELECT DISTINCT {cols} FROM lineitem WHERE {where}"


def _string_query(rng: random.Random) -> str:
    """String-function composition over documents — 1-based SUBSTR,
    LENGTH, UPPER/LOWER, || concat are all shared dialect."""
    exprs = rng.sample(
        [
            "LENGTH(text) AS len_t",
            "UPPER(lang) AS lang_u",
            "SUBSTR(text, 1, 12) AS head12",
            "LOWER(source) || ':' || lang AS tag",
            "LENGTH(REPLACE(text, ' ', '')) AS len_nospace",
        ],
        k=rng.choice([2, 3]),
    )
    cut = rng.choice([100, 250, 400])
    limit = rng.choice([25, 100])
    return (
        f"SELECT doc_id, {', '.join(exprs)} FROM documents "
        f"WHERE n_chars < {cut} ORDER BY doc_id LIMIT {limit}"
    )


def _exists_query(rng: random.Random) -> str:
    """(NOT) EXISTS correlated on orderkey — Spark decorrelates to a
    semi/anti join (the q4/q21/q22 shape); DuckDB runs the same text."""
    neg = rng.choice(["EXISTS", "NOT EXISTS"])
    ocut = rng.choice(
        [
            "o.o_orderstatus = 'F'",
            "o.o_orderpriority = '1-URGENT'",
            "o.o_custkey < 500",
        ]
    )
    where = _predicate(rng)
    return (
        f"SELECT l_returnflag, COUNT(*) AS n, SUM(l_linenumber) AS sum_ln "
        f"FROM lineitem l WHERE ({where}) AND {neg} "
        f"(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND {ocut}) "
        f"GROUP BY l_returnflag"
    )


def _in_subquery(rng: random.Random) -> str:
    """(NOT) IN against a subquery key set — o_orderkey is non-null so
    NOT IN's null-aware special case never fires on either engine."""
    neg = rng.choice(["IN", "NOT IN"])
    ocut = rng.choice(
        [
            "o_orderstatus = 'P'",
            "o_custkey % 7 = 0",
            "o_orderpriority IN ('2-HIGH', '5-LOW')",
        ]
    )
    where = _predicate(rng)
    return (
        f"SELECT l_linestatus, COUNT(*) AS n, MIN(l_orderkey) AS min_ok "
        f"FROM lineitem WHERE ({where}) AND l_orderkey {neg} "
        f"(SELECT o_orderkey FROM orders WHERE {ocut}) GROUP BY l_linestatus"
    )


def _scalar_subquery(rng: random.Random) -> str:
    """Uncorrelated scalar-aggregate threshold (the q11/q15/q22 shape) —
    exact-integer comparison, no float boundary."""
    fn = rng.choice(["MIN", "MAX"])
    ocut = rng.choice(["o_custkey < 100", "o_orderstatus = 'O'", "o_custkey % 11 = 3"])
    cmp_op = rng.choice(["<", ">="])
    where = _predicate(rng)
    return (
        f"SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
        f"WHERE ({where}) AND l_orderkey {cmp_op} "
        f"(SELECT {fn}(o_orderkey) FROM orders WHERE {ocut}) "
        f"GROUP BY l_returnflag"
    )


def _correlated_scalar_query(rng: random.Random) -> str:
    """Correlated groupwise-max scalar subquery (the q2/q17 shape):
    rows equal to their group's max line number."""
    where = _predicate(rng)
    limit = rng.choice([50, 200])
    return (
        f"SELECT l_orderkey, l_linenumber FROM lineitem l "
        f"WHERE ({where}) AND l_linenumber = "
        f"(SELECT MAX(l2.l_linenumber) FROM lineitem l2 "
        f" WHERE l2.l_orderkey = l.l_orderkey) "
        f"ORDER BY l_orderkey, l_linenumber LIMIT {limit}"
    )


def _frame_query(rng: random.Random) -> str:
    """Explicit window FRAMES — ROWS offsets and RANGE peer-groups are a
    classic cross-engine divergence spot.  NOTE (l_orderkey, l_linenumber)
    is NOT unique in the synthetic data: ROWS-frame determinism rests on
    tied duplicate rows being identical in every aggregated column PLUS
    the wv tail in the final ORDER BY — any new frame variant projecting
    a column that differs across tied rows needs its own tie-breaker.
    The RANGE frame orders by the non-unique l_orderkey deliberately —
    RANGE includes ALL peers, so the aggregate is deterministic even
    though the row order within peers is not."""
    part = rng.choice(STR_COLS)
    func = rng.choice(
        ["SUM(l_linenumber)", "MIN(l_orderkey)", "MAX(l_linenumber)", "COUNT(*)"]
    )
    if rng.random() < 0.25:
        n = rng.choice([1, 5, 100])
        win = (
            f"OVER (PARTITION BY {part} ORDER BY l_orderkey "
            f"RANGE BETWEEN {n} PRECEDING AND CURRENT ROW)"
        )
    else:
        frame = rng.choice(
            [
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
                "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
                "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
            ]
        )
        win = f"OVER (PARTITION BY {part} ORDER BY l_orderkey, l_linenumber {frame})"
    where = _predicate(rng)
    limit = rng.choice([50, 200])
    return (
        f"SELECT l_orderkey, l_linenumber, {part}, {func} {win} AS wv "
        f"FROM lineitem WHERE {where} "
        f"ORDER BY {part}, l_orderkey, l_linenumber, wv LIMIT {limit}"
    )


def _lag_lead_query(rng: random.Random) -> str:
    """LAG/LEAD with offsets and literal defaults over a fully-unique
    ordering — boundary-row default handling must agree."""
    part = rng.choice(STR_COLS)
    fn = rng.choice(["LAG", "LEAD"])
    off = rng.choice([1, 2, 5])
    default = rng.choice(["0", "-1", "999999"])
    win = f"OVER (PARTITION BY {part} ORDER BY l_orderkey, l_linenumber)"
    where = _predicate(rng)
    limit = rng.choice([50, 200])
    return (
        f"SELECT l_orderkey, l_linenumber, "
        f"{fn}(l_linenumber, {off}, {default}) {win} AS nb "
        f"FROM lineitem WHERE {where} "
        # nb tail: lineitem's (l_orderkey, l_linenumber) is NOT unique in
        # the synthetic data; tied duplicate rows carry different nb
        # values, so only nb makes the ordering (and LIMIT) deterministic
        f"ORDER BY {part}, l_orderkey, l_linenumber, nb LIMIT {limit}"
    )


def _null_order_query(rng: random.Random) -> str:
    """Explicit NULLS FIRST/LAST with ASC/DESC over a synthesized-null
    column: the engines' DEFAULT null placement differs (Spark: nulls
    first ASC; DuckDB: nulls last), so the subset always spells it out —
    this family proves the explicit spellings agree."""
    nl = rng.choice(["NULLS FIRST", "NULLS LAST"])
    dirn = rng.choice(["ASC", "DESC"])
    sentinel = rng.choice([1, 2, 3])
    where = _predicate(rng)
    limit = rng.choice([50, 200])
    return (
        f"SELECT l_orderkey, l_linenumber, "
        f"CASE WHEN l_linenumber = {sentinel} THEN NULL ELSE l_linenumber END AS v "
        f"FROM lineitem WHERE {where} "
        f"ORDER BY v {dirn} {nl}, l_orderkey, l_linenumber LIMIT {limit}"
    )


def _cases() -> list[str]:
    rng = random.Random(SEED)
    out = []
    for _ in range(N_CASES):
        gen = rng.choice(
            [
                _agg_query,
                _scan_query,
                _join_query,
                _window_query,
                _having_query,
                _setop_query,
                _case_query,
                _distinct_query,
                _string_query,
                # r5: the subquery/decorrelation space the TPC-H pattern
                # module exercises with hand-written queries
                _exists_query,
                _in_subquery,
                _scalar_subquery,
                _correlated_scalar_query,
                # late r5: frame offsets / boundary defaults / explicit
                # null placement — the ordering-semantics corners
                _frame_query,
                _lag_lead_query,
                _null_order_query,
            ]
        )
        out.append(gen(rng))
    return out


CASES = _cases()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF_DIR, t + '.parquet')}')"
        )
    return con


@pytest.fixture(scope="module")
def spark_views(spark):
    for t in ["lineitem", "orders", "documents"]:
        spark.read.parquet(os.path.join(SF_DIR, t + ".parquet")).createOrReplaceTempView(t)
    return spark


@pytest.mark.parametrize("idx", range(N_CASES))
def test_differential_case(spark_views, duck, idx):
    sql = CASES[idx]
    sdf = spark_views.sql(sql)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ocols = [d[0] for d in duck.execute(sql).description]
    orows = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert [c.lower() for c in scols] == [c.lower() for c in ocols], sql
    if "ORDER BY" not in sql:
        srows, orows = sorted(srows), sorted(orows)
    assert srows == orows, f"case {idx}: {sql}\nspark={srows[:5]}\nduck={orows[:5]}"
