#!/usr/bin/env python3
"""check_oracle.py with a per-query DuckDB time budget.

Usage: check_oracle_budget.py <sfDir> <verifyOutDir> [budgetSeconds] [skip...]

Same compare as check_oracle.py, but each oracle query runs under a
watchdog that interrupts DuckDB after the budget — a query whose ORACLE
is too slow at this scale is reported as [BUDGET] and skipped, instead
of stalling the whole sweep. Engine-side results are already landed by
graft.Verify; the budget only bounds DuckDB's replay cost.
"""
import json
import math
import sys
import threading
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def values_eq(a, b):
    # STRICT (r10): exact only, matching check_oracle.py — the driver
    # hashes exact renderings, so a tolerance pass is a driver FAIL.
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
        return True
    return a == b


HAZARD_DUCK = ("HUGEINT", "UHUGEINT", "DECIMAL", "FLOAT", "REAL", "TINYINT")
HAZARD_ARROW = ("decimal", "float", "halffloat")  # float = float32 in arrow


def type_hazards(con, sql, tbl):
    """Columns whose type the driver's hasher renders engine-dependently."""
    bad = []
    try:
        for name, typ in con.execute(
                f"SELECT column_name, column_type FROM (DESCRIBE ({sql}))"
                ).fetchall():
            t = typ.upper()
            if any(t.startswith(h) for h in HAZARD_DUCK):
                bad.append(f"duckdb:{name}:{typ}")
    except Exception as e:
        bad.append(f"duckdb:DESCRIBE-ERR:{e}")
    for field in tbl.schema:
        t = str(field.type)
        if any(t.startswith(h) for h in HAZARD_ARROW):
            bad.append(f"spark:{field.name}:{t}")
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    skip = set(sys.argv[4:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = n_budget = n_norac = 0
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        if name in skip:
            n_budget += 1
            print(f"  [SKIP]   {name}")
            continue
        if name not in oracle:
            n_norac += 1
            continue
        # The timer callback checks a per-query "still running" flag
        # under a lock so a query finishing right at the budget boundary
        # cannot leave a stale interrupt on the shared connection (which
        # would cancel — and mislabel — the NEXT query).
        running = {"v": True}
        lock = threading.Lock()

        def _interrupt():
            with lock:
                if running["v"]:
                    con.interrupt()

        timer = threading.Timer(budget, _interrupt)
        timer.start()
        try:
            res = con.execute(oracle[name])
            exp_cols = [c[0] for c in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            msg = str(e)
            if "INTERRUPT" in msg.upper() or "interrupted" in msg:
                n_budget += 1
                print(f"  [BUDGET] {name}: oracle exceeded {budget:.0f}s in DuckDB")
            else:
                n_bad += 1
                print(f"  [ORACLE-ERR] {name}: {e}")
            continue
        finally:
            with lock:
                running["v"] = False
            timer.cancel()
        tbl = pq.read_table(str(d))
        haz = type_hazards(con, oracle[name], tbl)
        if haz:
            n_bad += 1
            print(f"  [TYPE]   {name}: driver-hash hazard {haz}")
            continue
        gc, gr = canon([tuple(r.values()) for r in tbl.to_pylist()], tbl.column_names)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec or len(gr) != len(er):
            n_bad += 1
            print(f"  [MISMATCH] {name}: schema/rows differ")
            continue
        ok = all(values_eq(va, vb) for ra, rb in zip(gr, er) for va, vb in zip(ra, rb))
        if ok:
            n_ok += 1
            print(f"  [OK]     {name}: {len(gr)} rows")
        else:
            n_bad += 1
            print(f"  [VALUES] {name}")
    print(f"\nexact={n_ok} bad={n_bad} oracle-over-budget={n_budget} rows-only={n_norac}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
