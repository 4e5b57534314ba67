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


def classes_stamp(root="target/scala-2.13/classes"):
    """Fingerprint of the compiled classes: a recompile mid-run would
    shift the sorted-query slice indices between JVMs (coverage holes,
    double-counted rows) — abort instead of merging garbage."""
    acc = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            acc.append((p, st.st_mtime_ns, st.st_size))
    return hash(tuple(sorted(acc)))

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
    slice_canary_ok, warmed = [], set()
    twin_of = {}
    stamp0 = classes_stamp()
    for k in range(n):
        if classes_stamp() != stamp0:
            sys.exit("compiled classes changed mid-run; slice indices "
                     "would no longer partition the query set — aborting")
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
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
        cmap = part.get("canary", {})
        cfailed = part.get("canary_failed", [])
        # A slice whose canary set did not FULLY succeed (a canary
        # threw, or an older jar emitted no canaries) must not feed the
        # normalization: a fast-failing canary shrinks the divisor and
        # silently inflates the slice's normalized rows, and a 0.0 sum
        # drags the median down for every healthy slice.
        n_expected = len(cmap) + len(cfailed)
        ok = not cfailed and n_expected > 0 and sum(cmap.values()) > 0
        slice_canary.append(round(sum(cmap.values()), 3))
        slice_canary_ok.append(ok)
        warmed.update(part.get("warmed", []))
        twin_of.update(part.get("twin_of", {}))
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
    # Median over HEALTHY slices only; a slice with failed/absent
    # canaries keeps its raw times in queries_norm (recorded in
    # norm_skipped_slices so a reader knows which rows are raw).
    healthy = [c for c, ok in zip(slice_canary, slice_canary_ok) if ok]
    canary_med = sorted(healthy)[len(healthy) // 2] if healthy else 0.0
    norm = {}
    for q, v in merged.items():
        k = query_slice[q]
        c = slice_canary[k]
        norm[q] = (round(v * (canary_med / c), 3)
                   if slice_canary_ok[k] and canary_med > 0 else v)
    doc = {"metric": "total", "value": total, "unit": "sec",
           "failed": len(failed), "failed_queries": failed, "sf": sf_dir,
           "sliced": n, "fixture": fixture,
           "canary_per_slice": slice_canary, "canary_med": canary_med,
           "canary_ok_per_slice": slice_canary_ok,
           "norm_skipped_slices": [k for k, ok in enumerate(slice_canary_ok)
                                   if not ok],
           "warmed": sorted(warmed),
           "twin_of": dict(sorted(twin_of.items())),
           "queries": dict(sorted(merged.items())),
           "queries_norm": dict(sorted(norm.items()))}
    with open(out, "w") as f:
        json.dump(doc, f)
    print(f"total {total}s over {len(merged)} queries "
          f"(canaries {slice_canary}, med {canary_med}) -> {out}")
    # Twin drift report: a cfg_* row compiles to the SAME plan its
    # Scala twin runs, so (normalized) cfg/twin >> 1 when both are
    # multi-second rows points at the config COMPILER, not the
    # operator. Informational — nothing here gates.
    drifted = []
    for cfg, twin in sorted(twin_of.items()):
        if cfg in norm and twin in norm and min(norm[cfg], norm[twin]) >= 1.0:
            r = norm[cfg] / norm[twin]
            if r > 1.4 or r < 1 / 1.4:
                drifted.append(f"  {cfg} {norm[cfg]}s vs {twin} {norm[twin]}s"
                               f" (x{r:.2f})")
    if drifted:
        print("twin drift (cfg vs Scala twin, normalized):")
        print("\n".join(drifted))


if __name__ == "__main__":
    main()
