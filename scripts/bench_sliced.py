#!/usr/bin/env python3
"""Sub-batched bench runner: N fresh JVMs, each a round-robin slice of
the registered queries (SPARK_GRAFT_SLICE=k/n), merged into one bench
JSON. Purpose: a TRUSTWORTHY standing sf1 artifact — a single 200-query
JVM session accumulates broadcast blocks / JIT churn / old-gen that
distorts individual rows 3-6x in either direction (r10: copurchase_norm
25.4 s in-session vs 3.6 s warm-isolated; video_shots 7.4 s vs 2.0 s).

Usage: python3 scripts/bench_sliced.py <sfDir> <outJson> [nSlices]
"""
import json
import os
import subprocess
import sys

OPENS = [x for p in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar"]
    for x in ("--add-opens", f"java.base/{p}=ALL-UNNAMED")]


def main():
    sf_dir, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    merged, failed, fixture = {}, [], {}
    slice_canary, query_slice = [], {}
    for k in range(n):
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
                   SPARK_GRAFT_SLICE=f"{k}/{n}",
                   SPARK_GRAFT_REPS=os.environ.get("SPARK_GRAFT_REPS", "5"))
        cmd = (["java"] + OPENS +
               ["-Dspark.ui.enabled=false",
                "-Dspark.sql.session.timeZone=UTC",
                "-Xmx" + os.environ.get("SPARK_DRIVER_MEM", "48g"),
                "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
                "graft.Bench"])
        subprocess.run(cmd, env=env, check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open("bench_last.json") as f:
            part = json.load(f)
        merged.update(part["queries"])
        query_slice.update({q: k for q in part["queries"]})
        slice_canary.append(round(sum(part.get("canary", {}).values()), 3))
        failed += part.get("failed_queries", [])
        stamp = part.get("fixture", {})
        if fixture and stamp and stamp != fixture:
            sys.exit(f"fixture changed mid-run: {fixture.get('hash')} "
                     f"-> {stamp.get('hash')}")
        fixture = stamp or fixture
        print(f"slice {k + 1}/{n}: {len(part['queries'])} queries, "
              f"subtotal {part['value']}s", flush=True)
    total = round(sum(merged.values()), 3)
    # Canary normalization: each slice JVM measured the same fixed
    # canary set warm; a slice whose canaries ran hot was a hot JVM/box
    # window, so its rows are scaled by (median slice canary / its
    # canary). Cross-round comparison: divide by the artifacts' canary
    # ratio first, then call what's left a regression.
    canary_med = sorted(slice_canary)[len(slice_canary) // 2] if slice_canary else 0.0
    norm = {}
    for q, v in merged.items():
        c = slice_canary[query_slice[q]]
        norm[q] = round(v * (canary_med / c), 3) if c > 0 else v
    doc = {"metric": "total", "value": total, "unit": "sec",
           "failed": len(failed), "failed_queries": failed, "sf": sf_dir,
           "sliced": n, "fixture": fixture,
           "canary_per_slice": slice_canary, "canary_med": canary_med,
           "queries": dict(sorted(merged.items())),
           "queries_norm": dict(sorted(norm.items()))}
    with open(out, "w") as f:
        json.dump(doc, f)
    print(f"total {total}s over {len(merged)} queries "
          f"(canaries {slice_canary}, med {canary_med}) -> {out}")


if __name__ == "__main__":
    main()
