"""Summarize an xprof op_profile JSON (written by profile_sd2.py) into
actionable tables: per-category totals with achieved TFLOP/s and HBM GB/s,
plus the top individual ops.

IMPORTANT: the xprof op_profile serialization caps each category at ~100
child ops, so summing leaves UNDERCOUNTS (the r3 512² profile summed to
1.65 s of a 4.2 s program that way — the missing 2.5 s was truncated
convolution-fusion children). Category-node times are authoritative; the
leaf table is a top-K drill-down with its coverage fraction printed.

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


def leaves(node, acc):
    """Collect op-level nodes: descend while children carry real time;
    fusion nodes list their fused instructions as zero-metric children, so
    the fusion instance itself is the leaf there."""
    ms = node.get("metrics", {})
    ch = node.get("children", [])
    if not ch or sum(t_of(c.get("metrics", {})) for c in ch) == 0:
        acc.append((t_of(ms), ms, node.get("name", "?")))
        return
    for c in ch:
        leaves(c, acc)


def bucket(name: str) -> str:
    return re.sub(r"\.\d+.*$", "", name)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sd2_op_profile.json"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    prof = json.load(open(path))
    root = prof.get("byCategory") or prof.get("byProgram") or prof

    # program nodes are the children of the by_program root; categories are
    # their children. Category self-time is complete even when the per-op
    # child list is truncated at ~100 entries.
    cats = defaultdict(lambda: [0.0, 0.0, 0.0, 0, 0.0])  # t, flops, bytes, occ, leaf_t
    acc = []
    idle = 0.0
    programs = root.get("children", [root])
    for prog in programs:
        if prog.get("name") == "IDLE":
            idle += t_of(prog.get("metrics", {}))
            continue
        for cat in prog.get("children", []):
            ms = cat.get("metrics", {})
            c = cats[cat.get("name", "?")]
            c[0] += t_of(ms)
            c[1] += ms.get("rawFlops", 0.0)
            c[2] += sum(ms.get("rawBytesAccessedArray", []) or [0])
            c[3] += ms.get("occurrences", 0)
            sub = []
            leaves(cat, sub)
            c[4] += sum(s[0] for s in sub)
            acc.extend(sub)

    total = sum(c[0] for c in cats.values())
    print(f"total device time: {total/1e9:.1f} ms   (+ idle {idle/1e9:.1f} ms)"
          f"   leaf entries: {len(acc)}")

    print(f"\n{'category':32s} {'ms':>9s} {'%':>6s} {'TFLOP/s':>8s} {'GB/s':>7s}"
          f" {'occ':>6s} {'leaf-cov':>8s}")
    for name, (t, fl, by, occ, leaf_t) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        if t <= 0:
            continue
        tf = fl / (t / 1e12) / 1e12
        bw = by / (t / 1e12) / 1e9
        cov = leaf_t / t * 100 if t else 0.0
        print(f"{name[:32]:32s} {t/1e9:9.2f} {t/total*100:6.2f} {tf:8.1f}"
              f" {bw:7.0f} {occ:6d} {cov:7.0f}%")

    # leaf drill-down grouped by op name (top-K per category only — read the
    # leaf-cov column above before trusting a class sum from this table)
    byb = defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for t, ms, name in acc:
        b = byb[bucket(name)]
        b[0] += t
        b[1] += ms.get("rawFlops", 0.0)
        b[2] += sum(ms.get("rawBytesAccessedArray", []) or [0])
        b[3] += ms.get("occurrences", 0)
    print(f"\nleaf op classes (truncated drill-down):")
    print(f"{'class':42s} {'ms':>9s} {'TFLOP/s':>8s} {'GB/s':>7s} {'occ':>6s}")
    for name, (t, fl, by, occ) in sorted(byb.items(), key=lambda kv: -kv[1][0])[:top_n]:
        if t <= 0:
            continue
        tf = fl / (t / 1e12) / 1e12
        bw = by / (t / 1e12) / 1e9
        print(f"{name[:42]:42s} {t/1e9:9.2f} {tf:8.1f} {bw:7.0f} {occ:6d}")

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
