#!/usr/bin/env python3
"""Dev-only at-scale oracle sweep with a per-query timeout.

`oracle_check.py` replays every oracle serially with no timeout — fine at the
driver's sf0.01 gate, but some ORACLE replays are deliberately reference-shaped
rather than scalable (e.g. x101's exact threshold-Jaccard SELF-JOIN: the
DuckDB side is the quadratic baseline the engine's prefix-filter exists to
beat), so a full sweep at sf1 wedges on oracle-side cost that says nothing
about the engine. This wrapper runs EACH query's compare in its own process
with a wall-clock timeout and classifies: ok / rows-only / FAIL /
ORACLE-TIMEOUT (the oracle replay, not the Spark result, exceeded the
budget).

Usage: python3 tools/oracle_scale_sweep.py <sfDir> <verifyOutDir> [timeoutSec] [jobs]
Writes a JSON summary to stdout's last line.
"""
import json
import multiprocessing as mp
import sys
from pathlib import Path


def check_one(sf_dir, out_dir, name, oracle_sql, q):
    import duckdb
    sys.path.insert(0, str(Path(__file__).parent))
    from oracle_check import compare, check_declared_types
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    try:
        if oracle_sql is None:
            n = con.sql(
                f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            q.put(("rows-only", f"{n} rows {'OK' if n > 0 else 'EMPTY!'}"))
            return
        duck = con.sql(oracle_sql)
        duck_cols, duck_rows = duck.columns, duck.fetchall()
        check_declared_types(duck_cols, con.sql(oracle_sql).types)
        spark = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_cols, spark_rows = spark.columns, spark.fetchall()
        issues = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if issues:
            q.put(("FAIL", "; ".join(issues[:4])))
        else:
            q.put(("ok", f"{len(spark_rows)} rows"))
    except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
        q.put(("FAIL", f"ERROR: {e}"))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    names = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    counts = {"ok": 0, "rows-only": 0, "FAIL": 0, "ORACLE-TIMEOUT": 0}
    details = {}
    ctx = mp.get_context("fork")
    for name in names:
        q = ctx.Queue()
        p = ctx.Process(target=check_one,
                        args=(sf_dir, out_dir, name, oracle.get(name), q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            status, msg = "ORACLE-TIMEOUT", f"oracle replay > {timeout:.0f}s"
        else:
            try:
                status, msg = q.get_nowait()
            except Exception:  # noqa: BLE001
                status, msg = "FAIL", "worker died without a verdict"
        counts[status] += 1
        details[name] = {"status": status, "note": msg}
        print(f"[{status}] {name}: {msg}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "timeout_sec": timeout,
                      "counts": counts,
                      "failed": [n for n, d in details.items()
                                 if d["status"] == "FAIL"],
                      "oracle_timeout": [n for n, d in details.items()
                                         if d["status"] == "ORACLE-TIMEOUT"]}))
    sys.exit(1 if counts["FAIL"] else 0)


if __name__ == "__main__":
    main()
