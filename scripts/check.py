#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Registers each test parquet as a DuckDB view, runs every oracle SQL from
<verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet written by graft.Verify. Compare is: column names (sorted),
row count, and exact values (rows sorted by all columns, order-insensitive)
plus an order-sensitive pass for information.
"""
import json
import sys
import math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def rows_key(rows):
    return sorted(tuple(canon(v) for v in r) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # Verify records per-query exceptions here (missing file = old dump);
    # surface them as ERR so a thrown query can never read as "absent".
    # An errored query is then SKIPPED below — its dump was deleted, so
    # the oracle compare would re-report the same root cause as a second
    # FAIL ("no files found") and double-count one failure.
    errored = {}
    try:
        with open(f"{out_dir}/errors.json") as f:
            errored = json.load(f)
    except FileNotFoundError:
        pass
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        # A Verify killed mid-write leaves a truncated errors.json; name
        # it and keep checking instead of dying before any PASS/FAIL line.
        print(f"ERR  errors.json unreadable ({e}); per-query errs unknown")
    n_err = 0
    for name, msg in sorted(errored.items()):
        print(f"ERR  {name}: {msg[:300]}")
        n_err += 1
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if name in errored:
            continue
        sql = oracles[name]
        try:
            oracle = con.sql(sql)
            ocols = [c.lower() for c in oracle.columns]
            orows = oracle.fetchall()
            spark = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [c.lower() for c in spark.columns]
            srows = spark.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(ocols) != sorted(scols):
            problems.append(f"columns differ: oracle={sorted(ocols)} spark={sorted(scols)}")
        else:
            # reorder both to sorted column order
            operm = [ocols.index(c) for c in sorted(ocols)]
            sperm = [scols.index(c) for c in sorted(scols)]
            orows2 = [tuple(r[i] for i in operm) for r in orows]
            srows2 = [tuple(r[i] for i in sperm) for r in srows]
            if len(orows2) != len(srows2):
                problems.append(f"row count: oracle={len(orows2)} spark={len(srows2)}")
            elif rows_key(orows2) != rows_key(srows2):
                ok, sk = rows_key(orows2), rows_key(srows2)
                diffs = [(a, b) for a, b in zip(ok, sk) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    # queries without oracle (rows-only)
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracles and name not in errored:
            # Verify leaves non-dump directories alone, so a user dir can
            # legitimately sit here — note it instead of crashing on it.
            try:
                n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            except Exception:
                print(f"SKIP {name}: not a result dump (no readable parquet)")
                continue
            print(f"ROWS {name}: {n} rows (no oracle)")
    tail = f", {n_err} errored" if n_err else ""
    print(f"\n{n_pass} passed, {n_fail} failed{tail}")
    sys.exit(1 if (n_fail or n_err) else 0)


if __name__ == "__main__":
    main()
