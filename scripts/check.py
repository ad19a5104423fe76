#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus `oracle_sql.json`,
runs each oracle SQL in DuckDB against the same sf dir's parquet tables,
and compares: schema (column names), row count, and values (exact after
sorting columns by name and rows by all columns; floats compared both
exactly and with 1e-9 relative tolerance so mismatches are diagnosable).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def canon(rows, cols):
    """Sort columns by name, then rows lexicographically (driver-style)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for name, sql in sorted(oracle.items()):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERROR: {e}"
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        # The driver fetches oracle results as a dataframe: DuckDB HUGEINT
        # (e.g. SUM over BIGINT) converts to float64 there and the exact
        # hash fails even though fetchall() Python ints compare equal
        # here. DBAPI description type codes are the generic 'NUMBER', so
        # inspect the real types via the relation API.
        try:
            rel = con.sql(sql)
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()]
        except Exception:  # noqa: BLE001
            huge = []
        if huge:
            results[name] = f"HUGEINT-ORACLE-COLUMN {huge} (driver hash will FAIL — CAST to BIGINT)"
            continue
        if gc != ec:
            results[name] = f"SCHEMA gcols={gc} ecols={ec}"
        elif len(gr) != len(er):
            results[name] = f"ROWCOUNT got={len(gr)} exp={len(er)}"
        elif gr == er:
            results[name] = "OK"
        else:
            # exact mismatch — is it within float tolerance?
            approx = all(
                len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
                for a, b in zip(gr, er))
            if approx:
                results[name] = "OK-APPROX (exact hash may fail!)"
                for a, b in zip(gr, er):
                    if a != b:
                        results[name] += f" e.g. {a} vs {b}"
                        break
            else:
                diff = next((a, b) for a, b in zip(gr, er) if a != b)
                results[name] = f"VALUES e.g. got={diff[0]} exp={diff[1]}"
    bad = 0
    for name, r in results.items():
        flag = "PASS" if r == "OK" else "FAIL"
        if r != "OK":
            bad += 1
        print(f"{flag} {name}: {r}")
    print(f"\n{len(results) - bad}/{len(results)} OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
