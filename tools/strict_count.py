#!/usr/bin/env python3
"""Strict >2x set vs DuckDB at a given SF (r17 verdict #7).

Joins a Spark bench detail file (bench_passes*.json, query_mins) with the
pinned DuckDB baseline (duckdb_baseline*.json, per_query) and reports:
  - shared-set totals and the ratio
  - the STRICT set: shared queries where spark_min > 2x duck_min and
    duck_min > 0.3s (the r17 verdict definition)
  - the WEAK subset: strict entries with an absolute gap >= 1.5s
  - DuckDB DNFs (complete on Spark)

Usage: python3 tools/strict_count.py bench_passes_sf10.json duckdb_baseline_sf10.json
"""
import json
import sys


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_passes_sf10.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "duckdb_baseline_sf10.json"
    bench = json.load(open(bench_path))
    base = json.load(open(base_path))
    spark = bench["query_mins"]
    duck = base["per_query"]
    dnf = set(base.get("dnf", []))

    shared = sorted(k for k in spark if k in duck and k not in dnf)
    s_tot = sum(spark[k] for k in shared)
    d_tot = sum(duck[k] for k in shared)

    strict = [
        (spark[k] / duck[k], spark[k], duck[k], k)
        for k in shared
        if duck[k] > 0.3 and spark[k] > 2.0 * duck[k]
    ]
    strict.sort(reverse=True)
    weak = [e for e in strict if e[1] - e[2] >= 1.5]

    print(f"shared set: {len(shared)} queries, spark {s_tot:.1f}s vs duckdb "
          f"{d_tot:.1f}s = {s_tot / d_tot:.3f}x")
    print(f"duckdb DNFs (complete on Spark): {len(dnf)}")
    print(f"\nSTRICT set (>2x, duck>0.3s): {len(strict)}")
    for r, s, d, k in strict:
        tag = " WEAK" if s - d >= 1.5 else ""
        print(f"  {k:28s} spark {s:6.2f}s  duck {d:6.2f}s  {r:5.1f}x{tag}")
    print(f"\nWEAK subset (gap >= 1.5s): {len(weak)}")


if __name__ == "__main__":
    main()
