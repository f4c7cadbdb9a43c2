"""sf10 correctness probes for the heavy legacy queries the sf10
campaign had not reached (VERDICT r14 #3): q_pagerank, q_dedup_cc, and
q_dedup_pipeline — the last now carries the only full-candidate
Jaccard-scorer coverage after the r14 pair-restriction pushdown, so its
replica-densified run is the missing scale evidence for the
unrestricted path.

Oracle strategy per query (the tools/probe_sf10_dedup.py precedent —
keep the SEMANTICS, swap formulations that explode single-node):

- q_pagerank: the registered oracle is one unrolled CTE statement whose
  sf10 plan materializes three 110M-row iteration joins at once;
  infeasible as ONE statement (r12 finding). Here the SAME integer
  arithmetic runs as ITERATIVE SQL driven from Python — one temp table
  per iteration, previous iterations dropped — so peak state is one
  rank vector + the edge list.
- q_dedup_cc: the registered oracle's recursive-CTE reachability
  explodes (materializes (node, label) pairs per label seen). Replaced
  by iterative min-label propagation to a fixpoint — a different
  algorithm from the engine's pointer-jumping supersteps, so agreement
  checks the ANSWER, not the code path.
- q_dedup_pipeline: the registered oracle is scale-trivial
  (SELECT doc_id, TRUE FROM documents) — used verbatim; the evidence is
  the Spark side surviving 1M docs through signature → LSH → FULL
  candidate Jaccard verify → min-label keep list, hash-exact.

Usage: python tools/probe_sf10_heavy.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from tools.verify_local import canon_df  # noqa: E402

from pulsar_io_delta_spark.registry import all_queries  # noqa: E402
from pulsar_io_delta_spark.session import get_spark  # noqa: E402

SCALE = 10**12
ITERS = 3


def pagerank_oracle(con: duckdb.DuckDBPyConnection):
    """Iterative replay of _pagerank_oracle's exact integer arithmetic:
    pr0 = SCALE // n; pr_{k} = (15·(SCALE//n))//100 + (85·Σ_in pr//deg)
    //100, every division flooring BIGINT."""
    con.execute("""
CREATE OR REPLACE TEMP TABLE e AS
WITH e0 AS (
  SELECT DISTINCT o_custkey AS a, 10000000 + l_suppkey AS b
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
""")
    con.execute(
        "CREATE OR REPLACE TEMP TABLE deg AS "
        "SELECT src AS id, count(*) AS outdeg FROM e GROUP BY src"
    )
    nn = con.execute("SELECT count(DISTINCT src) FROM e").fetchone()[0]
    base = f"((15 * ({SCALE} // {nn})) // 100)"
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE p0 AS "
        f"SELECT id, ({SCALE} // {nn}) AS pr FROM deg"
    )
    for k in range(1, ITERS + 1):
        con.execute(f"""
CREATE OR REPLACE TEMP TABLE p{k} AS
WITH i AS (
  SELECT e.dst AS id, sum(p.pr // d.outdeg) AS m
  FROM e JOIN p{k - 1} p ON e.src = p.id JOIN deg d ON e.src = d.id
  GROUP BY e.dst)
SELECT d.id, {base} + ((85 * coalesce(i.m, 0)) // 100) AS pr
FROM deg d LEFT JOIN i ON d.id = i.id
""")
        con.execute(f"DROP TABLE p{k - 1}")
        print(f"  pagerank oracle: iteration {k} done", flush=True)
    return con.sql(
        f"SELECT id, CAST(pr AS BIGINT) AS pr FROM p{ITERS}"
    ).df()


def dedup_cc_oracle(con: duckdb.DuckDBPyConnection):
    """q_dedup_cc's corpus/edge construction verbatim, components by
    iterative min-label propagation to a fixpoint (the keep_best probe
    loop), final projection (doc_id, component, keep)."""
    con.execute("""
CREATE OR REPLACE TEMP TABLE corpus AS
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
""")
    con.execute("""
CREATE OR REPLACE TEMP TABLE edges AS
WITH grp AS (
  SELECT md5(text) AS h, min(doc_id) AS m FROM corpus GROUP BY md5(text)
),
e0 AS (
  SELECT c.doc_id AS src, g.m AS dst
  FROM corpus c JOIN grp g ON md5(c.text) = g.h
  WHERE c.doc_id <> g.m
  UNION ALL
  SELECT d.doc_id AS src, d.doc_id - 1 AS dst FROM documents d
  WHERE d.doc_id % 25 <> 0
    AND EXISTS (SELECT 1 FROM documents x WHERE x.doc_id = d.doc_id - 1)
)
SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
""")
    con.execute(
        "CREATE OR REPLACE TEMP TABLE lab AS "
        "SELECT doc_id AS id, doc_id AS lab FROM corpus"
    )
    for i in range(200):
        con.execute("""
CREATE OR REPLACE TEMP TABLE lab2 AS
SELECT l.id, least(l.lab, coalesce(n.m, l.lab)) AS lab
FROM lab l LEFT JOIN (
  SELECT e.dst AS id, min(l2.lab) AS m
  FROM edges e JOIN lab l2 ON l2.id = e.src
  GROUP BY e.dst) n ON n.id = l.id
""")
        changed = con.execute(
            "SELECT count(*) FROM lab l JOIN lab2 m ON l.id = m.id AND l.lab <> m.lab"
        ).fetchone()[0]
        con.execute("DROP TABLE lab")
        con.execute("ALTER TABLE lab2 RENAME TO lab")
        if changed == 0:
            print(f"  dedup_cc oracle: converged in {i + 1} rounds", flush=True)
            break
    else:
        raise RuntimeError("label propagation did not converge")
    return con.sql("""
SELECT id AS doc_id, lab AS component, (lab = id) AS keep FROM lab
""").df()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="probe-sf10-heavy")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("documents", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    specs = all_queries()
    rc = 0

    probes = (
        ("q_pagerank", lambda: pagerank_oracle(con)),
        ("q_dedup_cc", lambda: dedup_cc_oracle(con)),
        ("q_dedup_pipeline",
         lambda: con.sql(specs["q_dedup_pipeline"].oracle).df()),
    )
    for name, oracle in probes:
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = specs[name].fn(spark, sf_dir).toPandas()
        t1 = time.time()
        odf = oracle()
        t2 = time.time()
        a, b = canon_df(sdf), canon_df(odf)
        ok = len(a) == len(b) and list(a.columns) == list(b.columns) and a.equals(b)
        print(
            f"{'PASS' if ok else 'FAIL'} {name}: rows spark={len(sdf)} oracle={len(odf)}"
            f" hash_exact={ok} (spark {t1 - t0:.1f}s, oracle {t2 - t1:.1f}s)",
            flush=True,
        )
        if not ok:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
