#!/usr/bin/env python3
"""Compare two graft Bench JSON dumps with machine normalization.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio=2.0]

Per-query min times are compared after scaling by the machine factor:
the probe ratio (new probe_cpu_sec / old) when both runs carry probes,
else the median ratio across queries (robust to a few real
regressions). Queries whose normalized time moved by more than `ratio`
in either direction are listed. Builder-side tooling only.
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main(old_p, new_p, ratio):
    old, new = load(old_p), load(new_p)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = [k for k in qn if k in qo and qo[k] and qn[k]]
    if not shared:
        print("no shared queries")
        return 1
    if old.get("probe_cpu_sec", -1) > 0 and new.get("probe_cpu_sec", -1) > 0:
        scale = new["probe_cpu_sec"] / old["probe_cpu_sec"]
        basis = f"probe_cpu ratio {scale:.2f}"
    else:
        scale = statistics.median(qn[k] / qo[k] for k in shared)
        basis = f"median query ratio {scale:.2f}"
    print(f"machine factor: {basis}; {len(shared)} shared queries")
    moved = []
    for k in shared:
        norm = qn[k] / (qo[k] * scale)
        if norm > ratio or norm < 1 / ratio:
            moved.append((norm, k, qo[k], qn[k]))
    for norm, k, a, b in sorted(moved, reverse=True):
        tag = "SLOWER" if norm > 1 else "faster"
        print(f"  {k}: {a:.3f}s -> {b:.3f}s  ({norm:.2f}x normalized, {tag})")
    if not moved:
        print("  no query moved beyond the threshold")
    tot_o = sum(qo[k] for k in shared)
    tot_n = sum(qn[k] for k in shared)
    print(f"shared totals: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / (tot_o * scale):.2f}x normalized)")
    return 0


if __name__ == "__main__":
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sys.exit(main(sys.argv[1], sys.argv[2], r))
