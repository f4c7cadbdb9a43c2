"""Synthesize a k×-scaled fixture set from an existing sf dir (round 9,
VERDICT r8 #7: the planted-corpus and error-bound contracts had only
been gate-verified to sf0.1 — this builds an sf1-equivalent locally so
the FULL oracle gate can run at 10× the rows).

Replication keeps cross-table join keys consistent: each replica rep
offsets orderkeys by rep*10M in orders AND lineitem, custkeys by
rep*1M in customer AND orders, part/supp keys likewise; dimension
tables region/nation are shared (unscaled), exactly like TPC-H scale
factors. documents/embeddings/events replicate with DENSE id offsets
(rep * source row count) — the driver's own generator produces dense
ids at every sf, so a sparse 1e7/1e8 offset would test an id domain
no real fixture has (and collide with the planted-pair id encodings,
which are contracts on the FIXTURE domain, like TPC-H key ranges).
Text payloads stay byte-identical (duplicate density rises — the
HARSHER direction for dedup: denser LSH buckets, bigger candidate
sets — and oracles over text RECOMPUTE from the same bytes, so the
comparison stays meaningful). Embedding replicas are circularly
SHIFTED by rep positions: real scaled data has fresh random vectors,
and byte-identical vector replicas would create cos=1.0 groups and
top-k ties that no plausible fixture contains; shifted random vectors
are uncorrelated, restoring the documented fixture property that
cross-id cosine stays far below the 0.999 dup threshold.

Usage: python tools/make_sf_scale.py <src_sf_dir> <dst_dir> [k=10]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    # table -> {column: offset_unit}; offset applied as col + rep*unit
    offsets = {
        "lineitem": {
            "l_orderkey": 10_000_000,
            "l_partkey": 1_000_000,
            "l_suppkey": 1_000_000,
        },
        "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
        "customer": {"c_custkey": 1_000_000},
        "part": {"p_partkey": 1_000_000},
        "supplier": {"s_suppkey": 1_000_000},
        # dense ids (offset = source row count), like the real generator
        "events": {"event_id": "count", "user_id": 1_000_000},
        "documents": {"doc_id": "count"},
        "embeddings": {"vec_id": "count"},
    }
    shared = ["region", "nation"]

    for t in shared:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: shared (unscaled)")
    for t, off in offsets.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        nrows = con.execute(
            f"SELECT count(*) FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]

        def expr(c: str) -> str:
            if c in off:
                unit = nrows if off[c] == "count" else off[c]
                return f"{c} + rep * {unit} AS {c}"
            if t == "embeddings" and c == "embedding":
                # circular shift by rep: replicas decorrelate like real
                # fresh random vectors (cos ~ 0, never near the 0.999
                # dup threshold), killing the cos=1.0 groups / top-k
                # ties byte-identical replication would fabricate
                return (
                    "CASE WHEN rep = 0 THEN embedding ELSE "
                    "embedding[(CAST(rep AS INT) % len(embedding)) + 1 :] "
                    "|| embedding[: CAST(rep AS INT) % len(embedding)] "
                    f"END AS {c}"
                )
            return c

        sel = ", ".join(expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"range(0, {k}) t(rep)) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n:,} rows ({k}x)")


if __name__ == "__main__":
    main()
