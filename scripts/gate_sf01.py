#!/usr/bin/env python3
"""The strict sf0.1 gate, complete: every oracle-carrying query gets
correctness evidence at this scale — a full DuckDB oracle replay where
it fits the budget, and a named substitute check where the ORACLE
(not the engine) is the bottleneck.

Five closure oracles exceed any reasonable DuckDB budget at sf0.1
(all-pairs Jaccard / recursive transitive closure over 5,000 docs):
dedup_near, dedup_clusters, dedup_survivors, jaccard_pairs, corpus_mix.
Their substitutes:

  - graft.tools.DedupCrossCheck: independent-property checks for the
    dedup family (survivor fixed point, incremental==batch, raw-shingle
    re-verify + banded-subset for jaccard_pairs, cluster-map
    consistency for dedup_clusters/dedup_near).
  - corpus_mix: a DuckDB replay of the gate+mix stages OVER THE
    ENGINE'S dedup_survivors DUMP (whose own correctness is the fixed
    point above) — the closure drops out, everything downstream of the
    dedup is oracle-replayed exactly.

Usage: gate_sf01.py <sfDir> <verifyOutDir> [budgetSeconds]
Requires a prior `graft.Verify <sfDir> <verifyOutDir>` dump.
Exit 0 only if the budgeted oracle sweep has bad=0 AND every
over-budget query's substitute check passes.
"""
import json
import re
import subprocess
import sys
from pathlib import Path

import duckdb

CLOSURE_ORACLES = {"dedup_near", "dedup_clusters", "dedup_survivors",
                   "jaccard_pairs", "corpus_mix"}

# Queries whose oracle replays WHEN the budget allows, but whose
# evidence does not depend on it: DedupCrossCheck's incremental==batch
# lane independently proves dedup_incremental at this scale, so a
# machine-speed-dependent budget overrun on its (closure-free but
# heavy) oracle must degrade to the substitute, not fail the gate.
SUBSTITUTE_COVERED = CLOSURE_ORACLES | {"dedup_incremental"}

# The exact closure-driven losers CTE emitted by NorthStar's oracle
# builder; the substitute defines losers from the engine's survivor
# dump instead (unreferenced recursive CTEs are never evaluated).
LOSERS_CLOSURE = ("losers AS (\n"
                  "  SELECT src AS doc_id FROM reach GROUP BY src\n"
                  "  HAVING least(src, min(dst)) <> src),")
LOSERS_FROM_DUMP = ("losers AS (\n"
                    "  SELECT doc_id FROM documents\n"
                    "  WHERE doc_id NOT IN (SELECT doc_id FROM engine_survivors)),")

OPENS = [x for p in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar"]
    for x in ("--add-opens", f"java.base/{p}=ALL-UNNAMED")]


def canon(rows):
    return sorted((tuple((v is None, str(v)) for v in r) for r in rows))


def corpus_mix_replay(sf_dir, out_dir):
    sql = json.loads((Path(out_dir) / "oracle_sql.json").read_text())["corpus_mix"]
    if sql.count(LOSERS_CLOSURE) != 1:
        return False, "oracle text changed: closure losers CTE not found once"
    sub = sql.replace(LOSERS_CLOSURE, LOSERS_FROM_DUMP)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{Path(sf_dir) / 'documents.parquet'}')")
    con.execute(f"CREATE VIEW engine_survivors AS SELECT * FROM "
                f"read_parquet('{Path(out_dir) / 'dedup_survivors'}/*.parquet')")
    res = con.execute(sub)
    exp_cols = [c[0] for c in res.description]
    exp = res.fetchall()
    import pyarrow.parquet as pq
    tbl = pq.read_table(str(Path(out_dir) / "corpus_mix"))
    if sorted(tbl.column_names) != sorted(exp_cols):
        return False, f"schema {tbl.column_names} vs {exp_cols}"
    order = [tbl.column_names.index(c) for c in exp_cols]
    got = [tuple(r[c] for c in exp_cols) for r in tbl.to_pylist()]
    exp_named = [dict(zip(exp_cols, r)) for r in exp]
    exp_t = [tuple(d[c] for c in exp_cols) for d in exp_named]
    if canon(got) != canon(exp_t):
        return False, f"rows differ: engine={len(got)} oracle={len(exp_t)}"
    return True, f"{len(got)} rows exact (gate+mix replayed over survivor dump)"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = sys.argv[3] if len(sys.argv) > 3 else "150"
    here = Path(__file__).parent
    ok = True

    # 1. Budgeted full oracle sweep, closure oracles pre-skipped.
    r = subprocess.run(
        [sys.executable, str(here / "check_oracle_budget.py"),
         sf_dir, out_dir, budget] + sorted(CLOSURE_ORACLES),
        capture_output=True, text=True)
    tail = r.stdout.strip().splitlines()
    summary = tail[-1] if tail else ""
    print(f"[gate] oracle sweep: {summary}")
    over_budget = [ln.split()[1].rstrip(":") for ln in tail
                   if "[BUDGET]" in ln or "[SKIP]" in ln]
    if r.returncode != 0:
        for ln in tail:
            if any(k in ln for k in ("[ORACLE-ERR]", "[TYPE]", "[MISMATCH]", "[VALUES]")):
                print(f"[gate] {ln.strip()}")
        ok = False
    uncovered = set(over_budget) - SUBSTITUTE_COVERED
    if uncovered:
        print(f"[gate] FAIL: over-budget queries with no substitute check: {uncovered}")
        ok = False

    # 2. Dedup-family independent-property checks (engine side).
    r2 = subprocess.run(
        ["java"] + OPENS +
        ["-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
         "graft.tools.DedupCrossCheck", sf_dir],
        capture_output=True, text=True)
    for ln in r2.stdout.splitlines():
        if ln.startswith(("CHECK", "SUMMARY")):
            print(f"[gate] {ln}")
    if r2.returncode != 0:
        ok = False

    # 3. corpus_mix: DuckDB replay of everything downstream of dedup.
    good, detail = corpus_mix_replay(sf_dir, out_dir)
    print(f"[gate] CHECK corpus_mix_replay {'PASS' if good else 'FAIL'} {detail}")
    ok = ok and good

    print(f"[gate] {'PASS' if ok else 'FAIL'}: every oracle query has "
          f"sf0.1-scale evidence (oracle or substitute)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
