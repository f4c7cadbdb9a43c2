"""One-session headline sweep at an arbitrary scale dir (r16, VERDICT
r15 #4): run every bench.HEADLINE query once (noop sink) in a SINGLE
JVM, scrubbing session state between queries with
pulsar_io_delta_spark.session.session_scrub — the bounded-state policy
for a long-running driver. The r15 sf10 sweep without scrubbing OOM'd
its 16 GB JVM after 66 queries (accumulated memory sinks, state-store
providers, checkpointed blocks, undrained broadcasts); the Done
criterion is the full sweep completing in one default-memory session.

Usage: python tools/sweep_headline.py [SF_DIR] [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_headline.json"
    from bench import HEADLINE
    from pulsar_io_delta_spark.registry import all_queries
    from pulsar_io_delta_spark.session import get_spark, session_scrub

    spark = get_spark(app_name="pids-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(HEADLINE):
        t0 = time.time()
        try:
            specs[name].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            timings[name] = round(time.time() - t0, 1)
            print(f"[{i + 1}/{len(HEADLINE)}] {name} {timings[name]}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"[{i + 1}/{len(HEADLINE)}] {name} ERR {errors[name]}", flush=True)
        scrub = session_scrub(spark)
        if scrub.get("views_dropped"):
            print(f"    scrub: {scrub}", flush=True)
    payload = {
        "sf_dir": sf_dir,
        "n": len(HEADLINE),
        "ok": len(timings),
        "total_sec": round(sum(timings.values()), 1),
        "timings": timings,
        "errors": errors,
        "driver_mem": os.environ.get("SPARK_DRIVER_MEM", "16g"),
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({k: payload[k] for k in ("n", "ok", "total_sec")}))
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
