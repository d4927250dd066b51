#!/usr/bin/env python3
"""Per-query timing bands from recorded captures — so drift gets judged
against measured variance instead of prose.

Scans the committed BENCH_r*.json and target/bench_*.json capture files,
groups them by scale (the `sf` field: testdata sfN vs scale replicas),
and for every query reports min / median / max across captures plus the
latest capture's value and its position in the band. Writes
target/bands_<scale>.json and prints a drift table: queries whose latest
value sits ABOVE the recorded band (not merely above the median) are the
only ones worth a regression discussion.

Usage: python3 tools/bands.py [--scale sf0.1|10x] [--latest FILE]
"""
import argparse
import glob
import json
import os
import statistics
import sys
from pathlib import Path


def load_captures():
    """(scale_tag, path, queries-dict, meta) for every parseable capture."""
    out = []
    # captures/ is the COMMITTED band history (target/ dies with every
    # snapshot, and the driver's sf0.1 BENCH_r*.json wrappers are
    # truncated) — official per-session captures get copied there so
    # the variance record survives across sessions
    seen = set()  # a capture copied captures/ <-> target/ counts once
    for pat in ("BENCH_r*.json", "captures/*.json", "target/bench_*.json"):
        for p in sorted(glob.glob(pat)):
            try:
                d = json.loads(Path(p).read_text())
            except Exception:
                continue
            # driver wrapper files carry the real capture under `parsed`
            if "parsed" in d and isinstance(d.get("parsed"), dict):
                d = d["parsed"]
            if not isinstance(d, dict) or "queries" not in d:
                continue
            ident = (str(d.get("finished_at", "")), str(d.get("sf", "")),
                     json.dumps(d["queries"], sort_keys=True))
            if ident in seen:
                continue
            seen.add(ident)
            sf = str(d.get("sf", ""))
            if "scale10x" in sf or "10x" in p:
                tag = "10x"
            elif "scale300x" in sf:
                tag = "300x"
            elif "sf0.1" in sf:
                tag = "sf0.1"
            else:
                tag = sf or "unknown"
            out.append((tag, p, d["queries"],
                        {k: d.get(k) for k in
                         ("runs", "load_warning", "finished_at")}))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="sf0.1")
    ap.add_argument("--latest", default=None,
                    help="capture file to judge against the band "
                         "(default: the newest matching capture)")
    args = ap.parse_args()

    caps = [c for c in load_captures() if c[0] == args.scale]
    if not caps:
        sys.exit(f"no captures for scale {args.scale}")
    latest_path = args.latest or caps[-1][1]
    latest = next((q for _, p, q, _ in caps if p == latest_path), None)
    if latest is None:
        try:
            d = json.loads(Path(latest_path).read_text())
            latest = (d.get("parsed") or d)["queries"]
        except Exception:
            sys.exit(f"cannot read latest capture {latest_path}")

    # the judged capture must NOT contribute to its own band — with it
    # included, latest > max can never trigger for a committed capture
    # and the drift check is vacuous (caught round 15: a latest==max
    # row). Primary exclusion is by RESOLVED REAL PATH (catches every
    # spelling of the same file: captures/ vs target/, ./-prefixed,
    # absolute, symlinked). Content identity is only the FALLBACK for
    # re-serialized COPIES of the judged file (5 vs 5.0, key-order
    # drift, a cp into captures/) — and because two genuinely distinct
    # runs could in principle land numerically identical, a
    # content-identical NON-same-path skip is logged rather than
    # silent (r16 ADVICE: silent content-matching could drop a real
    # historical capture from the band pool).
    def norm(qs):
        return {q: float(v) for q, v in qs.items()
                if isinstance(v, (int, float))}

    latest_real = os.path.realpath(latest_path)
    latest_ident = norm(latest)
    hist = {}
    for _, p, qs, _ in caps:
        if os.path.realpath(p) == latest_real:
            continue
        if norm(qs) == latest_ident:
            print(f"[bands] note: {p} is content-identical to the judged "
                  f"capture ({latest_path}) but not the same file — "
                  "treating it as a copy and excluding it from the band",
                  file=sys.stderr)
            continue
        for q, v in qs.items():
            if isinstance(v, (int, float)):
                hist.setdefault(q, []).append(float(v))

    # refuse BEFORE writing anything: an empty band file left behind by
    # a failed run reads as a fresh, apparently valid, zero-query band
    # set to any consumer that skips the exit code
    if not hist:
        sys.exit("[bands] no OTHER capture to band against — "
                 "nothing was judged")

    # streaming micro-batch floors (captures/stream_floor.json, written
    # from a min-of-3 sf0.001 run — essentially zero data, so the time
    # is offset WAL + state commit + no-data batches): annotated per
    # query and rolled into a net-of-floor suite total, so the 2x-bar
    # discussion stops drifting as the suite's streaming row count grows
    floors = {}
    fp = Path("captures/stream_floor.json")
    if fp.exists():
        try:
            floors = json.loads(fp.read_text()).get("floors", {})
        except Exception:
            floors = {}

    bands = {}
    above = []
    for q in sorted(hist):
        vs = sorted(hist[q])
        b = {"n": len(vs), "min": vs[0], "median": statistics.median(vs),
             "max": vs[-1]}
        if q in floors:
            b["floor"] = floors[q]
        lv = latest.get(q)
        if isinstance(lv, (int, float)):
            b["latest"] = lv
            b["above_band"] = lv > vs[-1] + 1e-9
            if b["above_band"]:
                above.append((q, lv, vs[-1]))
        bands[q] = b

    out = Path(f"target/bands_{args.scale}.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(
        {"scale": args.scale, "captures": [p for _, p, _, _ in caps],
         "latest": latest_path, "bands": bands}, indent=1))
    print(f"[bands] {args.scale}: {len(caps)} captures, "
          f"{len(bands)} queries -> {out}")
    print(f"[bands] latest = {latest_path}")
    if floors:
        raw = sum(v for v in latest.values() if isinstance(v, (int, float)))
        fl = sum(floors[q] for q in floors
                 if isinstance(latest.get(q), (int, float)))
        print(f"[bands] latest suite total {raw:.1f}s; streaming "
              f"micro-batch floor {fl:.1f}s -> net-of-floor "
              f"{raw - fl:.1f}s")
    # 'within band' and 'never banded' must be distinguishable: a query
    # present only in the judged capture (new registration, or a scale
    # with a single capture) has NO band and is NOT judged — a green
    # verdict that silently judged zero queries would be vacuous.
    unbanded = sorted(q for q, v in latest.items()
                      if isinstance(v, (int, float)) and q not in hist)
    if unbanded:
        print(f"[bands] {len(unbanded)} queries have NO band yet "
              f"(absent from every other capture): "
              f"{', '.join(unbanded[:8])}"
              + (" ..." if len(unbanded) > 8 else ""))
    if above:
        print(f"[bands] {len(above)} queries ABOVE their recorded band:")
        for q, lv, mx in sorted(above, key=lambda t: t[2] - t[1]):
            print(f"  {q}: latest {lv:.2f}s > band max {mx:.2f}s "
                  f"(+{lv - mx:.2f}s)")
    else:
        print("[bands] no query above its recorded band")


if __name__ == "__main__":
    main()
