#!/usr/bin/env python3
"""Render SCALE.md-style markdown tables from a SCALEPROBE_r*.json artifact.

Usage: python3 scripts/scale_table.py SCALEPROBE_r12.json [query ...]

With no query args, renders one table per tier pair (sf0.1 -> sf1_exact and
sf0.1 -> sf1_perturbed) over every query present in both tiers. Dev-only
helper — the narrative `note` column of SCALE.md stays hand-written; this
generates the numeric columns so they can never drift from the artifact.
"""
import json
import sys


def fmt(rows, base, tier, names):
    byq = {}
    for r in rows:
        byq.setdefault(r["query"], {})[r["tier"]] = r
    print(f"| query | {base} wall / rows / shuffle_w | {tier} wall / rows / shuffle_w |")
    print("|---|---|---|")
    for q in names:
        t = byq.get(q, {})
        if base not in t or tier not in t:
            continue
        a, b = t[base], t[tier]
        print(
            f"| {q} | {a['wall_s']:.2f} s / {a['rows']:,} / {a['shuffle_w_mb']:.1f} MB "
            f"| {b['wall_s']:.2f} s / {b['rows']:,} / {b['shuffle_w_mb']:.1f} MB |")


def main():
    with open(sys.argv[1]) as f:
        art = json.load(f)
    rows = art["rows"]
    names = sys.argv[2:] or sorted({r["query"] for r in rows})
    for base, tier in (("sf0.1", "sf1_exact"), ("sf0.1", "sf1_perturbed"),
                       ("sf0.01", "sf0.1")):
        both = ({r["query"] for r in rows if r["tier"] == base} &
                {r["query"] for r in rows if r["tier"] == tier})
        if any(r["tier"] == tier and r["query"] in both for r in rows):
            print(f"\n## {base} -> {tier}\n")
            fmt(rows, base, tier, [q for q in names if q in both])
    notes = art.get("notes", {})
    if notes:
        print("\n## notes\n")
        for k in sorted(notes):
            print(f"- `{k}` — {notes[k]}")


if __name__ == "__main__":
    main()
