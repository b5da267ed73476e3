#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle against DuckDB over the same testdata, and compares:
column names (sorted), row counts, and values (exact where possible,
tiny-epsilon for floats). Not part of the engine — Python is only
driver-side tooling.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def cmp_val(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
            n_fail += 1
            continue
        got = got[gc]
        exp = exp[ec]
        bad = None
        exact = True
        for i in range(len(got)):
            for j, c in enumerate(gc):
                a, b = got.iloc[i, j], exp.iloc[i, j]
                a = None if (a is None or (isinstance(a, float) and math.isnan(a))) else a
                b = None if (b is None or (isinstance(b, float) and math.isnan(b))) else b
                if a is None and b is None:
                    continue
                if a is None or b is None or not cmp_val(a, b):
                    bad = (i, c, a, b)
                    break
                if isinstance(a, float) and isinstance(b, float) and a != b:
                    exact = False
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            tag = "PASS " if exact else "PASS~"  # ~ = float-epsilon only
            print(f"{tag} {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
