"""Dump `.explain("formatted")` for named queries into a directory.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <sf_dir> <query ...>

``repo_root`` is put at the head of sys.path, so the same script can
dump plans from a historical worktree (the `_before` files of an
optimization round) and from HEAD (`_after`) without editing either
tree. Plans are captured lazily — nothing is executed — except
streaming queries (their query fn runs the stream and returns the
sink), which are skipped with a note: their change surface is runtime
state-partitioning, not plan shape, and is documented by measured
decomposition instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> int:
    repo_root, out_dir, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, repo_root)
    from pulsar_io_delta_spark.registry import all_queries
    from pulsar_io_delta_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    suffix = os.environ.get("PLAN_SUFFIX", "")
    for name in names:
        if name not in specs:
            print(f"SKIP {name}: not registered in {repo_root}")
            continue
        try:
            df = specs[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, move on
            text = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted')\n")
            fh.write(f"# repo: {repo_root}  sf_dir: {sf_dir}\n\n")
            fh.write(text)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
