#!/usr/bin/env python3
"""Scale-rehearsal analyzer: compare two graft.Bench runs at different
scale factors and flag super-linear queries.

Usage: python3 tools/scale_report.py <bench_small.json> <bench_big.json> <mult>

For each query: ratio = t_big / t_small. With per-query fixed Spark job
overhead ~0.1-0.3 s, a healthy linear operator at multiplier M shows
ratio well below M (overhead amortizes). Flag anything with
ratio > 2*M as a scaling cliff, and ratio > M as worth a look.
Quadratic-by-design ground-truth queries are annotated, not flagged.
"""
import json
import sys

QUADRATIC_BY_DESIGN = {
    "sim_pairs": "exact threshold pair search (ground truth; sampled twin exists)",
    "sim_lsh": "contains exact ground-truth recall denominator",
    "dedup_semantic": "within-cell pair lists bound by k-means cells (n^2/k)",
    "dedup_minhash": "pair OUTPUT is Omega(sum m^2) on dup groups; "
                     "dedup_minhash_clusters is the scale path",
}


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    mult = float(sys.argv[3])
    qs, qb = small["queries"], big["queries"]
    rows = []
    for q in sorted(qb):
        if q not in qs or qs[q] <= 0:
            continue
        ratio = qb[q] / qs[q]
        rows.append((ratio, q, qs[q], qb[q]))
    rows.sort(reverse=True)
    cliffs = looks = 0
    print(f"{'query':24s} {'small':>8s} {'big':>8s} {'ratio':>7s}  verdict")
    for ratio, q, a, b in rows:
        if q in QUADRATIC_BY_DESIGN:
            verdict = f"quadratic-by-design: {QUADRATIC_BY_DESIGN[q]}"
        elif ratio > 2 * mult:
            verdict = "CLIFF (super-linear)"
            cliffs += 1
        elif ratio > mult:
            verdict = "above-linear, check plan"
            looks += 1
        else:
            verdict = "ok (sub-linear: overhead amortizes)"
        print(f"{q:24s} {a:8.3f} {b:8.3f} {ratio:6.1f}x  {verdict}")
    ts, tb = small["value"], big["value"]
    print(f"\ntotal: {ts:.1f}s -> {tb:.1f}s ({tb / ts:.1f}x at {mult:.0f}x data); "
          f"cliffs={cliffs} above-linear={looks}")


if __name__ == "__main__":
    main()
