"""Generate BENCH_anchor_birth.json (VERDICT r15 #6): an immutable
birth-round anchor for every headline query the r7 anchor table
predates, so creep on later-born queries is visible from their first
frozen round exactly the way r7-era queries are tracked.

Anchor choice per query: the EARLIEST quiet local freeze
(BENCH_local_r{N}.json, ascending N) that carries the query; falls
back to the earliest driver run (BENCH_r{NN}.json) for queries that
somehow never appeared in a local freeze. Values are copied verbatim
from those frozen records — re-running this script never changes an
existing entry unless the historical record itself changed (the
"immutable by provenance" property: every entry names its source
file).

Usage: python tools/make_birth_anchors.py   (writes repo-root file)
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(ROOT, "BENCH_anchor_r7.json")) as fh:
        r7 = json.load(fh)["median_sec"]

    sources = []
    for pat, kind in (("BENCH_local_r*.json", "local"), ("BENCH_r*.json", "driver")):
        for f in sorted(glob.glob(os.path.join(ROOT, pat))):
            m = re.search(r"_r(\d+)(?:_sf1)?\.json$", f)
            if not m or f.endswith("_sf1.json"):
                continue
            sources.append((kind, int(m.group(1)), f))
    # earliest round first; local freezes preferred over driver runs of
    # the same round (quiet-gate discipline)
    sources.sort(key=lambda t: (t[1], 0 if t[0] == "local" else 1))

    sys.path.insert(0, ROOT)
    from bench import HEADLINE

    out: dict[str, dict] = {}
    for kind, rnd, f in sources:
        try:
            with open(f) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        if rec.get("sf") not in (0.1, None):
            continue
        for name, sec in (rec.get("queries") or {}).items():
            if name in r7 or name in out or name not in HEADLINE:
                continue
            out[name] = {
                "sec": sec,
                "round": rnd,
                "source": os.path.basename(f),
            }

    missing = [q for q in HEADLINE if q not in r7 and q not in out]
    payload = {
        "sf": 0.1,
        "median_sec": {k: v["sec"] for k, v in sorted(out.items())},
        "provenance": {k: {"round": v["round"], "source": v["source"]}
                       for k, v in sorted(out.items())},
        "note": "birth-round anchors for queries younger than the r7 "
                "table; entries are copied verbatim from the named "
                "frozen record and never re-derived",
    }
    path = os.path.join(ROOT, "BENCH_anchor_birth.json")
    prev: dict = {"median_sec": {}}
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
    for k, v in prev.get("median_sec", {}).items():
        if k in payload["median_sec"] and payload["median_sec"][k] != v:
            print(f"REFUSE: existing anchor for {k} would change "
                  f"({v} -> {payload['median_sec'][k]}); anchors are immutable")
            return 1
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {len(out)} birth anchors; no-freeze-yet: {missing}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
