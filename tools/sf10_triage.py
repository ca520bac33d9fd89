#!/usr/bin/env python3
"""Triage the sf1->sf10 crossover for the full 259-entry bench (r15
verdict #1): compare per-query minima between bench_passes_sf1.json and
bench_passes_sf10.json, classify each entry by which tables its data
scaled (the sf10 replica is ReplicateCorpus `events` mode — only
events/orders/lineitem grow 10x; documents/embeddings/dims are
symlinked), and flag GROWERS: entries whose time grew faster than their
data did.

  python3 tools/sf10_triage.py [sf1_detail] [sf10_detail]

Classification: an entry whose sf10/sf1 time ratio exceeds the growth
bound x tolerance is a grower. Bound = 10x for scaled-table entries
(time may grow at most like data), 1x for symlinked-table entries (data
did not grow at all). Tolerance covers the job floor: sub-second
entries live on Spark's scheduler constant, so absolute floors apply
(entries under FLOOR_S at sf10 never flag).
"""
import json
import sys

FLOOR_S = 1.0          # below this at sf10, it's scheduler floor, not a term
SCALED_TOL = 1.3       # >13x for 10x data = superlinear
FLAT_TOL = 2.0         # symlinked data: >2x for 1x data = something grew


def main():
    sf1p = sys.argv[1] if len(sys.argv) > 1 else "bench_passes_sf1.json"
    sf10p = sys.argv[2] if len(sys.argv) > 2 else "bench_passes_sf10.json"
    m1 = json.load(open(sf1p))["query_mins"]
    m10 = json.load(open(sf10p))["query_mins"]
    missing = sorted(set(m1) - set(m10))
    if missing:
        print(f"ENTRIES MISSING AT SF10 ({len(missing)}): {missing}")
    growers, ok = [], 0
    for name in sorted(set(m1) & set(m10)):
        t1, t10 = m1[name], m10[name]
        ratio = t10 / t1 if t1 > 0 else float("inf")
        if t10 < FLOOR_S:
            ok += 1
            continue
        # every query family reads from Tables.*; the scaled set is the
        # event/orders/lineitem families (q*, ds_*, stream_* run on
        # events; TPC-H q* on lineitem/orders). doc/embed families are
        # flat. Prefix-classify; unknown prefixes default to scaled
        # (conservative: a flat entry misclassified as scaled only
        # loosens its bound, and the flat families have clear prefixes).
        # sketch_* reads events/orders (scaled), NOT the doc corpus — the
        # first cut of this script misclassified the family as flat
        flat = name.startswith(("text_", "doc_", "dedup_", "embed_",
                                "ann_", "mm_", "select_",
                                "graph_", "pipeline_dedup", "lang_"))
        bound = FLAT_TOL if flat else 10.0 * SCALED_TOL
        if ratio > bound:
            growers.append((name, t1, t10, ratio, "flat" if flat else "x10"))
        else:
            ok += 1
    print(f"entries compared: {ok + len(growers)}; under bound: {ok}; "
          f"growers: {len(growers)}")
    for name, t1, t10, ratio, kind in sorted(growers, key=lambda g: -g[3]):
        print(f"  GROWER {name:34s} [{kind}] sf1 {t1:7.2f}s -> sf10 "
              f"{t10:8.2f}s = {ratio:6.1f}x")


if __name__ == "__main__":
    main()
