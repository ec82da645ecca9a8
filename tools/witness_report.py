"""Witness-freshness report: for every registry entry, the latest
grading-driver round that recorded it green (from CORRECTNESS_r*.json
at the repo root), whether it sits in the CURRENT priority window, and
which entries have never been driver-checked.

This is the bookkeeping behind each round's window rotation (the
driver oracle-checks a 50-entry prefix of the registry per round):
rotation should front (1) never-checked entries, (2) entries whose
output values changed since their last witness, then (3) the stalest
green witnesses. The tool prints exactly that priority order so the
next rotation is mechanical.

Run:  python tools/witness_report.py
      python tools/witness_report.py --emit-window   # ready-to-paste
          50-entry tuple in priority order (never-checked first, then
          stalest greens oldest-round-first, registry order within a
          round). VALUE-CHANGED entries cannot be detected here — front
          them by hand before pasting.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    from kafka_flink_streaming_pipeline_spark.plans import PRIORITY_WINDOW, merged

    latest: dict[str, tuple[int, bool]] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, rec in json.loads(f.read_text()).items():
            ok = bool(rec.get("hash_match") or (rec.get("rows_match") and rec.get("err") is None and rec.get("hash_match") is None))
            latest[name] = (rnd, ok)

    plans = merged()
    window = set(PRIORITY_WINDOW)
    never = [n for n in plans if n not in latest]

    if "--emit-window" in sys.argv:
        ranked = never + [
            n
            for _, n in sorted(
                ((latest[n][0], n) for n in plans if n in latest),
                key=lambda t: (t[0], list(plans).index(t[1])),
            )
        ]
        print("PRIORITY_WINDOW: tuple[str, ...] = (")
        for n in ranked[:50]:
            print(f'    "{n}",')
        print(")")
        return 0
    red = [n for n, (r, ok) in latest.items() if not ok and n in plans]
    by_round: dict[int, list[str]] = {}
    for n in plans:
        if n in latest:
            by_round.setdefault(latest[n][0], []).append(n)

    print(f"registry entries: {len(plans)}")
    print(f"driver-witnessed (any round): {len([n for n in plans if n in latest])}")
    print(f"\nNEVER driver-checked ({len(never)}) — front these next:")
    for n in never:
        mark = " [in current window]" if n in window else ""
        print(f"  {n}{mark}")
    print(f"\nlatest row RED ({len(red)}):")
    for n in red:
        mark = " [in current window]" if n in window else ""
        print(f"  {n} (r{latest[n][0]}){mark}")
    print("\nwitness age (latest green round -> count; stalest fill the window next):")
    for rnd in sorted(by_round):
        names = by_round[rnd]
        in_w = sum(1 for n in names if n in window)
        print(f"  r{rnd}: {len(names)} entries ({in_w} in current window)")
    stale_round = min(by_round) if by_round else None
    if stale_round is not None:
        stale_out = [n for n in by_round[stale_round] if n not in window]
        if stale_out:
            print(f"\nstalest NOT in current window (r{stale_round}): {stale_out}")

    # witness-age floor telemetry (r11 verdict ask #6): a ready-to-paste
    # PERF.md table of (min, median, histogram) so rotation debt is a
    # printed number each round instead of a judge recomputation.
    # Age is measured in rounds-behind the newest CORRECTNESS file;
    # never-checked entries are listed separately (age = infinite).
    cur = max((r for r, _ in latest.values()), default=0)
    ages = sorted(cur - latest[n][0] for n in plans if n in latest)
    if ages:
        med = ages[len(ages) // 2]
        print("\nPERF.md paste (witness-age floor telemetry):")
        print(f"| witnessed | floor (oldest) | median age | never-checked |")
        print(f"|---|---|---|---|")
        print(
            f"| {len(ages)}/{len(plans)} | r{stale_round} "
            f"({cur - (stale_round or cur)} rounds behind r{cur}) "
            f"| {med} rounds | {len(never)} |"
        )
        print("| round | entries at that witness age |")
        print("|---|---|")
        for rnd in sorted(by_round):
            print(f"| r{rnd} | {len(by_round[rnd])} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
