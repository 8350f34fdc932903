#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB-oracle correctness gate.

NOT part of the engine (the Scala library has zero Python deps) — this script just
lets the build loop catch Spark↔DuckDB mismatches before the driver does.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
where <verifyOutDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    issues = []
    if sorted(spark_cols) != sorted(duck_cols):
        return [f"COLUMN MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"]
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted([tuple(norm_cell(r[i]) for i in order) for r in spark_rows],
               key=lambda t: [(x is None, str(type(x)), x) for x in t])
    d = sorted([tuple(norm_cell(r[i]) for i in dorder) for r in duck_rows],
               key=lambda t: [(x is None, str(type(x)), x) for x in t])
    if len(s) != len(d):
        return [f"ROW COUNT spark={len(s)} duck={len(d)}"]
    nshow = 0
    for i, (sr, dr) in enumerate(zip(s, d)):
        if sr != dr:
            # classify: float-near-miss vs hard mismatch
            hard = False
            for a, b in zip(sr, dr):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float) and abs(a - b) < 1e-6:
                    issues.append(f"FLOAT NEAR-MISS row {i}: {a!r} vs {b!r}")
                else:
                    hard = True
            if hard and nshow < 3:
                issues.append(f"MISMATCH row {i}:\n  spark={sr}\n  duck ={dr}")
                nshow += 1
            elif hard:
                issues.append("...")
                break
    # type check (approximate the driver's schema comparison)
    for sr, dr in zip(s[:1], d[:1]):
        for a, b, c in zip(sr, dr, sorted(spark_cols)):
            if a is not None and b is not None and type(a) is not type(b):
                issues.append(f"TYPE DIFF col {c}: spark {type(a).__name__} vs duck {type(b).__name__} ({a!r} vs {b!r})")
    return issues


def check_declared_types(cols, types):
    """Declared-type gate: fetchall() erases DuckDB's HUGEINT/DECIMAL vs
    Spark's BIGINT/DOUBLE distinction (both become Python int/Decimal→float),
    but the driver hashes the typed reprs — an un-cast sum() (HUGEINT) ships
    red even when every value matches (x51, x68, x75)."""
    for c, t in zip(cols, (str(t).upper() for t in types)):
        if "HUGEINT" in t or "DECIMAL" in t:
            raise ValueError(
                f"oracle col {c} is {t} — CAST it (BIGINT/DOUBLE) so the "
                "driver's typed hash matches Spark")


def selftest():
    """Canary for the declared-type gate itself: a deliberately UN-CAST
    sum() (DuckDB → HUGEINT) must be flagged, and the cast twin must pass.
    If a refactor ever drops the HUGEINT/DECIMAL check, this exits 1 —
    the class that shipped red three times (x51, x68, x75) must stay caught.
    Run: python3 tools/oracle_check.py --selftest  (also CI-asserted in
    OracleGateCanarySpec)."""
    con = duckdb.connect()
    bad = con.sql("SELECT sum(r) AS s FROM range(5) t(r)")            # HUGEINT
    good = con.sql("SELECT CAST(sum(r) AS BIGINT) AS s FROM range(5) t(r)")
    try:
        check_declared_types(bad.columns, bad.types)
    except ValueError as e:
        assert "HUGEINT" in str(e), f"wrong flag: {e}"
    else:
        print("SELFTEST FAIL: un-cast sum() (HUGEINT) was NOT flagged — "
              "the declared-type gate is broken")
        sys.exit(1)
    try:
        check_declared_types(good.columns, good.types)
    except ValueError as e:
        print(f"SELFTEST FAIL: cast BIGINT sum() was wrongly flagged: {e}")
        sys.exit(1)
    dec = con.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")           # DECIMAL
    try:
        check_declared_types(dec.columns, dec.types)
    except ValueError:
        pass
    else:
        print("SELFTEST FAIL: DECIMAL column was NOT flagged")
        sys.exit(1)
    print("selftest ok: un-cast HUGEINT/DECIMAL flagged, cast BIGINT passes")
    sys.exit(0)


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_ok = n_bad = 0
    out = Path(out_dir)
    result_dirs = sorted(p.name for p in out.iterdir() if p.is_dir())
    for name in result_dirs:
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            print(f"[rows-only] {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            continue
        try:
            duck = con.sql(oracle[name])
            duck_cols, duck_rows = duck.columns, duck.fetchall()
            check_declared_types(duck_cols, con.sql(oracle[name]).types)
            spark = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols, spark_rows = spark.columns, spark.fetchall()
            issues = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        except Exception as e:
            issues = [f"ERROR: {e}"]
        if issues:
            n_bad += 1
            print(f"[FAIL] {name}")
            for i in issues[:8]:
                print(f"   {i}")
        else:
            n_ok += 1
            print(f"[ok] {name} ({len(spark_rows)} rows)")
    missing = [k for k in oracle if k not in result_dirs]
    for k in missing:
        n_bad += 1
        print(f"[FAIL] {k}: oracle present but no spark output")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
