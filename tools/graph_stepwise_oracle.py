"""Stepwise-materialized DuckDB oracles for the iterative-graph queries.

VERDICT r08 #2: at sf1.0 (1M events / 6M lineitems) the single-statement
unrolled CTE oracles for ``q_pagerank_parts`` and ``q_label_propagation``
(registry._pagerank_oracle / registry._lpa_oracle) spill >79 GB of temp
disk in DuckDB and die on IO — the planner keeps every unrolled round's
hash tables (and re-derives the co-occurrence edge CTE per round) live
at once. The RECURRENCE is linear per round; only the one-shot plan
isn't. These functions run the IDENTICAL per-round SQL text — copied
fragment-for-fragment from the CTE builders so the floating-point
expression trees match term-for-term — but materialize each round into
a TEMP TABLE, capping live memory at one round's working set. This is
the same computation with explicit materialization barriers, not a
weaker invariant check: a MATCH is a full cross-engine recomputation.

Used by tools/sweep_differential.py (STEPWISE_ORACLES) for these two
names at every SF; the driver's sf0.01 gate still runs the registry's
single-statement oracles, and test_graph_stepwise_oracle pins that both
forms return identical frames at sf0.01.
"""

from __future__ import annotations

#: verbatim from registry._COOCCUR_EDGES_CTE, as standalone statements
_EDGE_TABLES = [
    """CREATE OR REPLACE TEMP TABLE und AS
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey""",
    """CREATE OR REPLACE TEMP TABLE edges AS
        SELECT a AS src, b AS dst, 1 AS w FROM und
        UNION ALL
        SELECT b AS src, a AS dst, 1 AS w FROM und""",
    """CREATE OR REPLACE TEMP TABLE nodes AS
        SELECT src AS node FROM edges UNION SELECT dst FROM edges""",
]


def _cleanup(con, tables: list[str]) -> None:
    for t in tables:
        con.execute(f"DROP TABLE IF EXISTS {t}")


def pagerank_parts(con, k: int = 5, damping: float = 0.85):
    """Stepwise twin of ORACLE["q_pagerank_parts"] (k=5, damping=0.85).

    Per-round SELECT text is registry._pagerank_oracle's pr{i} body with
    CTE references turned into temp-table references — including the
    f-string-rendered ``{1.0 - damping}`` teleport literal, so the
    double arithmetic is bit-identical to the CTE form.
    """
    tables = ["und", "edges", "nodes", "nn", "ce"] + [
        f"pr{i}" for i in range(k + 1)
    ]
    try:
        for stmt in _EDGE_TABLES:
            con.execute(stmt)
        con.execute(
            "CREATE OR REPLACE TEMP TABLE nn AS "
            "SELECT COUNT(*)::DOUBLE AS n FROM nodes"
        )
        con.execute(
            """CREATE OR REPLACE TEMP TABLE ce AS
            SELECT src, dst, w::DOUBLE / SUM(w) OVER (PARTITION BY src) AS frac
            FROM edges"""
        )
        con.execute(
            "CREATE OR REPLACE TEMP TABLE pr0 AS "
            "SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn"
        )
        for i in range(1, k + 1):
            con.execute(
                f"""CREATE OR REPLACE TEMP TABLE pr{i} AS
        SELECT nd.node,
               {1.0 - damping} / nn.n + {damping} * COALESCE(s.in_sum, 0) AS rank
        FROM nodes nd CROSS JOIN nn
        LEFT JOIN (
            SELECT ce.dst, SUM(p.rank * ce.frac) AS in_sum
            FROM ce JOIN pr{i - 1} p ON ce.src = p.node GROUP BY ce.dst
        ) s ON s.dst = nd.node"""
            )
            if i >= 2:
                con.execute(f"DROP TABLE pr{i - 2}")
        return con.execute(
            f"SELECT node, ROUND(rank, 6) AS rank FROM pr{k} "
            "ORDER BY rank DESC, node LIMIT 20"
        ).fetchdf()
    finally:
        _cleanup(con, tables)


def label_propagation(con, k: int = 3):
    """Stepwise twin of ORACLE["q_label_propagation"] (k=3).

    Per-round SQL is registry._lpa_oracle's c{i}/a{i}/l{i} bodies as
    three temp tables per round; the argmax recurrence and its
    (cw DESC, label) tie-break are textually identical.
    """
    tables = ["und", "edges", "nodes"] + [
        t for i in range(k + 1) for t in (f"c{i}", f"a{i}", f"l{i}")
    ]
    try:
        for stmt in _EDGE_TABLES:
            con.execute(stmt)
        con.execute(
            "CREATE OR REPLACE TEMP TABLE l0 AS "
            "SELECT node, node AS label FROM nodes"
        )
        for i in range(1, k + 1):
            con.execute(
                f"""CREATE OR REPLACE TEMP TABLE c{i} AS
        SELECT e.dst AS node, l.label, SUM(e.w) AS cw
        FROM edges e JOIN l{i - 1} l ON e.src = l.node GROUP BY 1, 2"""
            )
            con.execute(
                f"""CREATE OR REPLACE TEMP TABLE a{i} AS
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY cw DESC, label) AS rn
            FROM c{i}
        ) t WHERE rn = 1"""
            )
            con.execute(
                f"""CREATE OR REPLACE TEMP TABLE l{i} AS
        SELECT p.node, COALESCE(a.label, p.label) AS label
        FROM l{i - 1} p LEFT JOIN a{i} a ON a.node = p.node"""
            )
            con.execute(f"DROP TABLE c{i}")
            con.execute(f"DROP TABLE a{i}")
            con.execute(f"DROP TABLE l{i - 1}")
        return con.execute(
            f"""SELECT label AS community, COUNT(*) AS n_members
            FROM l{k} GROUP BY label
            ORDER BY n_members DESC, community LIMIT 20"""
        ).fetchdf()
    finally:
        _cleanup(con, tables)


#: sweep hook: name -> callable(con) -> pandas frame
STEPWISE_ORACLES = {
    "q_pagerank_parts": pagerank_parts,
    "q_label_propagation": label_propagation,
}
