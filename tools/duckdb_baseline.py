#!/usr/bin/env python3
"""Time DuckDB executing every oracle SQL — the operative local baseline.

Usage:
  python3 tools/duckdb_baseline.py <sfDir> <oracle_sql.json> [passes] [out.json]

Runs each oracle query `passes` times (default 3) against the sfDir parquet
tables with DuckDB fully materializing the result (df()), and writes
{"per_query": {name: min_sec}, "total": sum_of_mins, ...} to out.json
(default /tmp/duckdb_baseline.json). Compare per-query against
bench_passes.json "query_mins" for the graft-vs-DuckDB ratio table in
SCALING.md — both sides are min-over-passes, fully materialized.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "/tmp/duckdb_baseline.json"
    with open(oracle_path) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    # Bounded spill: at sf1 the recursive-CTE oracles (graph family +
    # pipeline_dedup) spill unboundedly — r13 measured >79 GB of temp
    # before dying on a full disk, which would take the whole box down
    # with it. Cap the temp dir so those queries fail FAST and land in
    # "errors" (= an explicit per-query DNF mark in the committed
    # artifact) instead of an operational incident.
    tmp = os.environ.get("DUCKDB_BASELINE_TMP", "/tmp/duckdb-baseline-spill")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET max_temp_directory_size='16GB'")
    for t in TABLES:
        # <t>.parquet may be a directory of part files (the sf1 bench
        # corpus layout — tools/make_sf1.py) — glob it for DuckDB
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    # Early-stop budget: once a query's best pass exceeds this, skip its
    # remaining passes — min-of-1 is fine when the magnitude dwarfs pass
    # noise (at sf1 some quadratic audit oracles run minutes in DuckDB;
    # re-running those 3x tripled an already hour-long baseline run for
    # no estimator benefit). Fast queries keep the full min-of-N.
    budget = float(os.environ.get("DUCKDB_BASELINE_BUDGET_S", "60"))
    # Per-query hard timeout (r17, the sf10 baseline): unlike the budget —
    # which only skips REPEAT passes — this interrupts a first run that
    # would otherwise hold the baseline hostage (the 16 GB spill cap DNFs
    # memory-shaped blowups, but a CPU-bound oracle at sf10 can run for
    # an hour without spilling). Interrupted queries land in "dnf" with a
    # timeout mark — an explicit per-query record, not a silent omission.
    timeout_s = float(os.environ.get("DUCKDB_BASELINE_TIMEOUT_S", "0"))
    best = {}
    errors = {}
    for name, sql in sorted(oracle.items()):
        for _ in range(passes):
            timer = None
            # Track whether the timer actually FIRED (r17 advice): elapsed
            # time alone mislabels a slow genuine error as a timeout, and a
            # timer that fires in the gap between query completion and
            # cancel() leaves a pending interrupt that can abort the NEXT
            # query. The flag resolves the label; the drain below clears
            # the stray interrupt.
            fired = [False]
            if timeout_s > 0:
                import threading

                def _interrupt():
                    fired[0] = True
                    con.interrupt()
                timer = threading.Timer(timeout_s, _interrupt)
                timer.start()
            t0 = time.monotonic()
            try:
                con.sql(sql).df()
            except Exception as e:
                dt = time.monotonic() - t0
                msg = str(e)[:200]
                if fired[0]:
                    msg = f"timeout after {dt:.1f}s (limit {timeout_s:.0f}s): " + msg
                errors[name] = msg
                break
            finally:
                if timer is not None:
                    timer.cancel()
                if fired[0] and name not in errors:
                    # timer fired but the query had already completed —
                    # drain the pending interrupt so it can't hit the next
                    # statement (version-dependent in duckdb)
                    try:
                        con.sql("SELECT 1").df()
                    except Exception:
                        pass
            dt = time.monotonic() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
            if best[name] > budget:
                break
        if name in best:
            print(f"  {name}: {best[name]:.3f}s", flush=True)

    result = {
        "sf": sf_dir,
        "passes": passes,
        "n_queries": len(best),
        "total_sum_of_mins": round(sum(best.values()), 3),
        # explicit per-query DNF marks (r13 verdict #1): queries DuckDB
        # could not finish at this SF (spill cap / errors) — the ratio
        # fields in any bench embedding this baseline compare SHARED
        # queries only, so DNFs are visible, not silently dropped
        "dnf": sorted(errors.keys()),
        "per_query": {k: round(v, 4) for k, v in best.items()},
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"DuckDB sum-of-mins: {result['total_sum_of_mins']}s over "
          f"{len(best)} queries ({len(errors)} errors) -> {out_path}")


if __name__ == "__main__":
    main()
