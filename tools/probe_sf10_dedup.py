"""sf10 correctness probe for the cross-run dedup operators
(VERDICT r12 #8): q_dedup_incremental and q_dedup_keep_best, hash-exact
against INDEPENDENT DuckDB formulations.

Why not verify_local: the registered oracles are written for the
driver's sf0.01 gate and two of their constructs explode at 500k docs —
``NOT IN (SELECT h FROM base)`` plans null-defensively (measured >40 min
and >80 GB before being killed), and q_dedup_keep_best's recursive-CTE
reachability materializes (node, label) pairs per label seen. This
probe keeps the SEMANTICS and swaps the formulations, the round-12
precedent (q_pagerank was verified at sf10 against an independently-
executed SQL formulation for the same reason):

- incremental: the anti-join as NOT EXISTS (identical semantics — md5
  is never NULL, so NOT IN null-handling cannot differ);
- keep_best: connected components as ITERATIVE min-label propagation
  driven from Python (one DuckDB UPDATE-shaped statement per round to a
  fixpoint — a different algorithm from the engine's pointer-jumping
  supersteps, so agreement checks the answer, not the code path).

Usage: python tools/probe_sf10_dedup.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from tools.verify_local import canon_df  # noqa: E402

from pulsar_io_delta_spark.registry import all_queries  # noqa: E402
from pulsar_io_delta_spark.session import get_spark  # noqa: E402

INCREMENTAL_SQL = """
WITH base AS (
  SELECT md5(text) AS h FROM documents WHERE doc_id % 4 <> 0
), delta AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 1000000, md5(text) FROM documents WHERE doc_id % 8 = 0
), survivors AS (
  SELECT d.doc_id, d.h,
         min(d.doc_id) OVER (PARTITION BY d.h) AS first_in_delta
  FROM delta d
  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.h = d.h)
)
SELECT doc_id, (doc_id = first_in_delta) AS admit
FROM survivors
"""


def keep_best_oracle(con: duckdb.DuckDBPyConnection):
    """Independent keep-best: CC by iterative min-label propagation to
    a fixpoint, then the same max_by(quality*1e7 + id) selection."""
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
        "CREATE OR REPLACE TEMP TABLE lab AS SELECT doc_id AS id, doc_id AS lab FROM corpus"
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
            print(f"  keep_best oracle: label propagation converged in {i + 1} rounds")
            break
    else:
        raise RuntimeError("label propagation did not converge")
    return con.sql("""
SELECT l.lab AS component,
       max_by(l.id, length(c.text) * 10000000 + l.id) AS keep_id,
       CAST(count(*) AS BIGINT) AS cluster_size
FROM lab l JOIN corpus c ON c.doc_id = l.id
GROUP BY l.lab
""").df()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark(app_name="probe-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    specs = all_queries()
    rc = 0

    for name, oracle in (
        ("q_dedup_incremental", lambda: con.sql(INCREMENTAL_SQL).df()),
        ("q_dedup_keep_best", lambda: keep_best_oracle(con)),
    ):
        t0 = time.time()
        sdf = specs[name].fn(spark, sf_dir).toPandas()
        t1 = time.time()
        odf = oracle()
        t2 = time.time()
        a, b = canon_df(sdf), canon_df(odf)
        ok = len(a) == len(b) and list(a.columns) == list(b.columns) and a.equals(b)
        print(
            f"{'PASS' if ok else 'FAIL'} {name}: rows spark={len(sdf)} oracle={len(odf)}"
            f" hash_exact={ok} (spark {t1 - t0:.1f}s, oracle {t2 - t1:.1f}s)"
        )
        if not ok:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
