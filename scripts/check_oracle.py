#!/usr/bin/env python3
"""Dev-side mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same sfDir tables, then
canonicalizes both sides (columns sorted by name, rows sorted by all columns)
and compares values.

STRICT by design (round-10 lesson: the driver hashes exact, type-sensitive
renderings, and the r9 mimic passed two rows the driver rejected):
  - a tolerance-only float match is a FAILURE (exit 1), not a pass;
  - result columns whose type renders differently across fetch paths are a
    FAILURE even when the Python values compare equal: DuckDB HUGEINT /
    UHUGEINT / DECIMAL / FLOAT(32) on the oracle side, DECIMAL / FLOAT32 on
    the Spark parquet side. (pps_sample was value-exact but driver-red in r9
    purely because sum(BIGINT) OVER (...) returns HUGEINT.)
Emit BIGINT / DOUBLE / VARCHAR / DATE / TIMESTAMP / BOOLEAN only.
"""
import json
import math
import sys
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
    if a is None and b is None:
        return True, True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False, False
        if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
            return True, True
        exact = a == b
        tol = abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
        return exact, tol
    eq = a == b
    return eq, eq


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
    except Exception as e:  # DESCRIBE failure is itself worth surfacing
        bad.append(f"duckdb:DESCRIBE-ERR:{e}")
    for field in tbl.schema:
        t = str(field.type)
        if any(t.startswith(h) for h in HAZARD_ARROW):
            bad.append(f"spark:{field.name}:{t}")
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_tol = n_bad = n_norac = 0
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        tbl = pq.read_table(str(d))
        got_cols = tbl.column_names
        got_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        if name not in oracle:
            n_norac += 1
            print(f"  [rows-only] {name}: {len(got_rows)} rows")
            continue
        try:
            res = con.execute(oracle[name])
            exp_cols = [c[0] for c in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            n_bad += 1
            print(f"  [ORACLE-ERR] {name}: {e}")
            continue
        haz = type_hazards(con, oracle[name], tbl)
        if haz:
            n_bad += 1
            print(f"  [TYPE]  {name}: driver-hash hazard {haz}")
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            n_bad += 1
            print(f"  [SCHEMA] {name}: spark={gc} duckdb={ec}")
            continue
        if len(gr) != len(er):
            n_bad += 1
            print(f"  [ROWS] {name}: spark={len(gr)} duckdb={len(er)}")
            continue
        exact = tol = True
        first_bad = None
        for ra, rb in zip(gr, er):
            for va, vb in zip(ra, rb):
                e, t = values_eq(va, vb)
                exact &= e
                tol &= t
                if not t and first_bad is None:
                    first_bad = (va, vb)
        if exact:
            n_ok += 1
            print(f"  [OK]    {name}: {len(gr)} rows")
        elif tol:
            n_tol += 1
            print(f"  [FLOAT] {name}: {len(gr)} rows (tolerance-only — the driver WILL reject this)")
        else:
            n_bad += 1
            print(f"  [VALUES] {name}: e.g. spark={first_bad[0]!r} duckdb={first_bad[1]!r}")
    print(f"\nexact={n_ok} float-only={n_tol} bad={n_bad} rows-only={n_norac}")
    sys.exit(1 if n_bad or n_tol else 0)


if __name__ == "__main__":
    main()
