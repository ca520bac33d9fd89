#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
sorts columns by name and rows by all columns, and compares values. Exit 1 on
any mismatch. Run before every commit.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    # Optional third arg: comma-separated name filter (matches Verify's).
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"oracle sql failed: {e}"))
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            failures.append((name, f"columns differ: spark={list(s.columns)} duck={list(d.columns)}"))
            continue
        if len(s) != len(d):
            failures.append((name, f"row count differs: spark={len(s)} duck={len(d)}"))
            continue
        # dtype-KIND parity: the driver hashes stringified values, so int64 3
        # vs float64 3.0 is a real mismatch there even though Python == says
        # equal. Catch it here (DuckDB HUGEINT sums surface as float64 — the
        # oracle must CAST ... AS BIGINT). Allow int-vs-int width diffs.
        kind_bad = None
        repr_cols = set()
        for col in s.columns:
            sk, dk = s[col].dtype.kind, d[col].dtype.kind
            if sk == dk or {sk, dk} == {"i", "u"}:
                continue
            if "O" in (sk, dk):
                # object-vs-anything can't be judged from the dtype alone
                # (all-NULL columns and DuckDB Decimals surface as object) —
                # don't skip the check: fall through to a strict repr
                # comparison per value, which mimics the driver's
                # stringified hash (int 3 vs float 3.0 vs Decimal('3') all
                # repr differently and must FAIL here like they would there)
                repr_cols.add(col)
                continue
            kind_bad = f"col {col}: dtype kind spark={s[col].dtype} duck={d[col].dtype}"
            break
        if kind_bad:
            failures.append((name, kind_bad))
            continue
        bad = None
        for col in s.columns:
            sv, dv = list(s[col]), list(d[col])
            for i, (x, y) in enumerate(zip(sv, dv)):
                if col in repr_cols:
                    if repr(x) != repr(y):
                        bad = (f"col {col} row {i} (object-dtype strict): "
                               f"spark={x!r} duck={y!r}")
                        break
                elif not values_equal(x, y):
                    bad = f"col {col} row {i}: spark={x!r} duck={y!r}"
                    break
            if bad:
                break
        if bad:
            failures.append((name, bad))
        else:
            print(f"  OK  {name}: {len(s)} rows, {len(s.columns)} cols")

    if failures:
        for name, msg in failures:
            print(f" FAIL {name}: {msg}")
        sys.exit(1)
    print(f"all {len(oracle)} queries match")


if __name__ == "__main__":
    main()
