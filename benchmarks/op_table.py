"""Summarize an xprof op_profile JSON (written by profile_sd2.py) into
actionable tables: per-op-class totals with achieved TFLOP/s and HBM GB/s,
plus the top individual ops. Handles both Pallas custom-calls (rawTime set)
and XLA fusions (avgTimePs * occurrences).

Usage: python benchmarks/op_table.py [/tmp/sd2_op_profile.json] [top_n]
"""
from __future__ import annotations

import json
import re
import sys
from collections import defaultdict


def t_of(ms: dict) -> float:
    t = ms.get("rawTime") or ms.get("normalizedTimePs") or 0.0
    if not t:
        t = ms.get("avgTimePs", 0.0) * ms.get("occurrences", 0)
    return t


def walk(node, acc):
    ms = node.get("metrics", {})
    ch = node.get("children", [])
    if not ch:
        acc.append((t_of(ms), ms, node.get("name", "?")))
    for c in ch:
        walk(c, acc)


def bucket(name: str) -> str:
    return re.sub(r"\.\d+.*$", "", name)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sd2_op_profile.json"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    prof = json.load(open(path))
    root = prof.get("byCategory") or prof.get("byProgram") or prof
    acc = []
    walk(root, acc)
    total = sum(a[0] for a in acc)
    print(f"total self time: {total/1e9:.1f} ms   leaves: {len(acc)}")

    byb = defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for t, ms, name in acc:
        b = byb[bucket(name)]
        b[0] += t
        b[1] += ms.get("rawFlops", 0.0)
        b[2] += sum(ms.get("rawBytesAccessedArray", []) or [0])
        b[3] += ms.get("occurrences", 0)
    print(f"\n{'class':42s} {'ms':>9s} {'%':>6s} {'TFLOP/s':>8s} {'GB/s':>7s} {'occ':>6s}")
    for name, (t, fl, by, occ) in sorted(byb.items(), key=lambda kv: -kv[1][0])[:top_n]:
        if t <= 0:
            continue
        tf = fl / (t / 1e12) / 1e12
        bw = by / (t / 1e12) / 1e9
        print(f"{name[:42]:42s} {t/1e9:9.2f} {t/total*100:6.2f} {tf:8.1f} {bw:7.0f} {occ:6d}")

    print(f"\ntop {top_n} individual ops:")
    acc.sort(key=lambda x: -x[0])
    for t, ms, name in acc[:top_n]:
        fl = ms.get("rawFlops", 0.0)
        by = sum(ms.get("rawBytesAccessedArray", []) or [0])
        occ = ms.get("occurrences", 0) or 1
        tf = fl / (t / 1e12) / 1e12 if t else 0.0
        bw = by / (t / 1e12) / 1e9 if t else 0.0
        print(f"{t/1e9:8.2f} ms  {t/total*100:5.2f}%  {tf:7.1f} TF/s {bw:6.0f} GB/s "
              f"{by/occ/1e6:7.1f} MB/occ  {name[:70]}")


if __name__ == "__main__":
    main()
