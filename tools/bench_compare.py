#!/usr/bin/env python
"""Noise-aware bench regression gate (round-4 verdict, next-round task #2).

Compares two bench DETAIL artifacts (the sidecar JSON bench.py writes to
``bench_out/``, carrying per-query medians AND min/max spreads) and flags
only moves that fall OUTSIDE the recorded noise envelope:

  regression  — the new spread sits entirely above the old spread AND the
                median moved > 10% (both conditions: disjoint intervals
                alone can be two tight-but-close samples; a >10% median
                move alone can be inside overlapping spreads = noise).
  improvement — symmetric, downward.
  otherwise   — within noise envelope; not reported as a move.

When one side has no recorded spread (e.g. the r3 artifact predates
spread capture), a ±15% band around its median stands in — roughly the
round-3→4 observed same-box variance for sub-second queries.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--markdown OUT.md]

Also importable: bench.py embeds ``compare(old, new)["verdict"]`` as the
one-line round-over-round verdict in its final stdout JSON.
"""

from __future__ import annotations

import argparse
import json
import sys

FALLBACK_BAND = 0.15  # envelope halfwidth when a side lacks recorded spread
MEDIAN_MOVE = 0.10  # minimum relative median move to call a change real


def _envelope(detail: dict, name: str) -> tuple[float, float, float] | None:
    med = detail.get("queries", {}).get(name)
    if med is None:
        return None
    spread = detail.get("queries_spread", {}).get(name)
    if spread:
        lo, hi = float(spread[0]), float(spread[1])
    else:
        lo, hi = med * (1 - FALLBACK_BAND), med * (1 + FALLBACK_BAND)
    return float(med), lo, hi


SHUFFLE_GROWTH = 1.25  # disk_ratio growth beyond this flags a plan regression


def compare_shuffle(old: dict, new: dict) -> list[dict]:
    """Diff the measured shuffle_write/on-disk-input ratios: wall-time noise
    can hide a plan regression (a join flipping off broadcast, a lost
    partial agg), but the bytes a plan shuffles are deterministic for a
    deterministic plan — >25% growth is a structural change, not noise."""
    rows = []
    olds, news = old.get("shuffle_audit", {}), new.get("shuffle_audit", {})
    for name, nrec in news.items():
        nr = nrec.get("disk_ratio")
        orec = olds.get(name, {})
        orr = orec.get("disk_ratio")
        if nr is None:
            continue
        status = "no-old-datum"
        if orr is not None:
            grew = orr > 0 and nr / orr > SHUFFLE_GROWTH
            # absolute guard for near-zero ratios where relative growth is
            # meaningless (0.003 -> 0.005 is not a plan change)
            status = "SHUFFLE-REGRESSION" if grew and (nr - orr) > 0.05 else "ok"
        rows.append({"query": name, "old_ratio": orr, "new_ratio": nr, "status": status})
    return rows


def compare(old: dict, new: dict, old_label: str = "old", new_label: str = "new") -> dict:
    rows = []
    names = [n for n in new.get("queries", {}) if n in old.get("queries", {})]
    for name in names:
        om, olo, ohi = _envelope(old, name)
        nm, nlo, nhi = _envelope(new, name)
        if nlo > ohi and nm > om * (1 + MEDIAN_MOVE):
            status = "REGRESSION"
        elif nhi < olo and nm < om * (1 - MEDIAN_MOVE):
            status = "improvement"
        else:
            status = "within-noise"
        rows.append(
            {
                "query": name,
                "old": om,
                "old_spread": [round(olo, 4), round(ohi, 4)],
                "new": nm,
                "new_spread": [round(nlo, 4), round(nhi, 4)],
                "ratio": round(nm / om, 3) if om else None,
                "status": status,
            }
        )
    rows.sort(key=lambda r: (-{"REGRESSION": 2, "improvement": 1}.get(r["status"], 0), -(r["ratio"] or 0)))
    regressions = [r["query"] for r in rows if r["status"] == "REGRESSION"]
    improvements = [r["query"] for r in rows if r["status"] == "improvement"]
    only_new = sorted(set(new.get("queries", {})) - set(old.get("queries", {})))
    shuffle_rows = compare_shuffle(old, new)
    shuffle_regs = [r["query"] for r in shuffle_rows if r["status"] == "SHUFFLE-REGRESSION"]
    verdict = {
        "vs": old_label,
        "n": len(rows),
        "reg": len(regressions),
        "imp": len(improvements),
        "shuf_reg": len(shuffle_regs),
        "regressions": (regressions + shuffle_regs)[:8],
    }
    return {
        "old_label": old_label,
        "new_label": new_label,
        "rows": rows,
        "shuffle_rows": shuffle_rows,
        "only_new": only_new,
        "verdict": verdict,
    }


def to_markdown(result: dict) -> str:
    old_l, new_l = result["old_label"], result["new_label"]
    v = result["verdict"]
    lines = [
        f"# Bench comparison: {old_l} → {new_l}",
        "",
        f"{v['n']} shared queries — **{v['reg']} regressions**, "
        f"{v['imp']} improvements, rest within the recorded noise envelope "
        f"(move counts only when the min/max spreads are disjoint AND the "
        f"median shifted >{int(MEDIAN_MOVE*100)}%).",
        "",
        f"| query | {old_l} med (spread) | {new_l} med (spread) | ratio | status |",
        "|---|---|---|---|---|",
    ]
    for r in result["rows"]:
        lines.append(
            f"| {r['query']} | {r['old']:.3f} ({r['old_spread'][0]:.3f}–{r['old_spread'][1]:.3f})"
            f" | {r['new']:.3f} ({r['new_spread'][0]:.3f}–{r['new_spread'][1]:.3f})"
            f" | {r['ratio']:.2f} | {r['status']} |"
        )
    if result["only_new"]:
        lines += ["", f"New queries (no {old_l} datum): " + ", ".join(result["only_new"])]
    shuffle_rows = result.get("shuffle_rows", [])
    if shuffle_rows:
        lines += [
            "",
            "## Measured shuffle ratios (shuffle_write / on-disk input)",
            "",
            f"Flags structural plan changes wall-time noise hides: "
            f">{int((SHUFFLE_GROWTH-1)*100)}% relative growth AND >0.05 absolute.",
            "",
            "| query | old ratio | new ratio | status |",
            "|---|---|---|---|",
        ]
        for r in shuffle_rows:
            old_s = f"{r['old_ratio']:.4f}" if r["old_ratio"] is not None else "—"
            lines.append(f"| {r['query']} | {old_s} | {r['new_ratio']:.4f} | {r['status']} |")
    return "\n".join(lines) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--markdown", default=None)
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    result = compare(old, new, args.old.rsplit("/", 1)[-1], args.new.rsplit("/", 1)[-1])
    md = to_markdown(result)
    if args.markdown:
        with open(args.markdown, "w") as f:
            f.write(md)
    print(md)
    print(json.dumps(result["verdict"]))
    return 1 if (result["verdict"]["reg"] or result["verdict"]["shuf_reg"]) else 0


if __name__ == "__main__":
    sys.exit(main())
