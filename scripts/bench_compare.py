#!/usr/bin/env python
"""Diff the last two rounds' bench artifacts and flag regressions.

Mechanizes the round-3 noise-investigation protocol (BENCH.md): per-query
deltas between the two newest ``BENCH_r*.json`` files, with >2x slowdowns
flagged loudly (this host's co-tenant noise band is up to 4x on a single
run, so a flag means "re-measure best-of-3 interleaved", not "regression
confirmed" — see BENCH.md methodology).

Usage:
    python scripts/bench_compare.py             # compare two newest rounds
    python scripts/bench_compare.py r03 r04     # explicit rounds
    python scripts/bench_compare.py --markdown  # BENCH.md-ready section

Exit code 1 when any query slowed >2x (so CI-ish wrappers can notice).
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG_RATIO = 2.0


def _load(path: str) -> dict | None:
    """A BENCH_r*.json is either the bare bench line or a driver wrapper
    with the line under 'parsed' (round-4 artifact shape)."""
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return None
    if isinstance(d, dict) and "queries" in d:
        return d
    if isinstance(d, dict) and isinstance(d.get("parsed"), dict):
        return d["parsed"]
    return None


def available_rounds() -> dict[str, str]:
    out = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_(r\d+)\.json$", path)
        if m and _load(path) is not None:
            out[m.group(1)] = path
    return out


def compare(old: dict, new: dict) -> dict:
    oq, nq = old.get("queries", {}), new.get("queries", {})
    rows = []
    for name in nq:
        if name in oq and oq[name] > 0:
            ratio = nq[name] / oq[name]
            rows.append((name, oq[name], nq[name], ratio))
        else:
            rows.append((name, None, nq[name], None))
    rows.sort(key=lambda r: -(r[3] or 0))
    flags = [r for r in rows if r[3] is not None and r[3] > FLAG_RATIO]
    return {
        "rows": rows,
        "flags": flags,
        "dropped": sorted(set(oq) - set(nq)),
        "total_old": old.get("value"),
        "total_new": new.get("value"),
        "throughput_old": (old.get("throughput") or {}).get("pages_per_sec"),
        "throughput_new": (new.get("throughput") or {}).get("pages_per_sec"),
        "scaling_old": (old.get("scaling") or {}).get("scaling_efficiency"),
        "scaling_new": (new.get("scaling") or {}).get("scaling_efficiency"),
    }


def render(cmp: dict, old_name: str, new_name: str, markdown: bool) -> str:
    lines = []
    hdr = f"bench {old_name} -> {new_name}"
    if markdown:
        lines.append(f"### Bench diff {old_name} → {new_name} (generated "
                     f"by scripts/bench_compare.py)")
        lines.append("")
        lines.append("| query | " + old_name + " s | " + new_name + " s | ratio |")
        lines.append("|---|---|---|---|")
    else:
        lines.append(hdr)
    for name, o, n, ratio in cmp["rows"]:
        flag = " **FLAG >2x**" if ratio is not None and ratio > FLAG_RATIO else ""
        rs = f"{ratio:.2f}x" if ratio is not None else "new"
        os_ = f"{o:.2f}" if o is not None else "-"
        if markdown:
            lines.append(f"| {name} | {os_} | {n:.2f} | {rs}{flag} |")
        else:
            lines.append(f"  {name:28s} {os_:>8s} -> {n:8.2f}  {rs}{flag}")
    t_o, t_n = cmp["total_old"], cmp["total_new"]
    if t_o and t_n:
        lines.append("" if markdown else "  " + "-" * 56)
        lines.append(
            f"{'**total**' if markdown else '  total'}: {t_o:.1f}s -> {t_n:.1f}s "
            f"({t_n / t_o:.2f}x)"
        )
    if cmp["throughput_old"] and cmp["throughput_new"]:
        lines.append(
            f"pipeline throughput: {cmp['throughput_old']:.0f} -> "
            f"{cmp['throughput_new']:.0f} pages/s"
        )
    if cmp["scaling_old"] and cmp["scaling_new"]:
        lines.append(
            f"scaling efficiency: {cmp['scaling_old']:.3f} -> "
            f"{cmp['scaling_new']:.3f}"
        )
    if cmp["dropped"]:
        lines.append(f"dropped from headline set: {', '.join(cmp['dropped'])}")
    if cmp["flags"]:
        names = ", ".join(f[0] for f in cmp["flags"])
        lines.append(
            f"FLAGGED >2x slower: {names} — re-measure best-of-3 interleaved "
            "before calling it a regression (BENCH.md noise protocol)"
        )
    else:
        lines.append("no query slowed >2x")
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    markdown = "--markdown" in argv
    args = [a for a in argv if not a.startswith("--")]
    rounds = available_rounds()
    if len(args) == 2:
        names = args
    else:
        if len(rounds) < 2:
            print("need at least two parseable BENCH_r*.json artifacts")
            return 2
        names = sorted(rounds)[-2:]
    try:
        old, new = (_load(rounds[n]) for n in names)
    except KeyError as e:
        print(f"unknown round {e}; available: {', '.join(sorted(rounds))}")
        return 2
    cmp = compare(old, new)
    print(render(cmp, names[0], names[1], markdown))
    return 1 if cmp["flags"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
