#!/usr/bin/env python3
"""Regenerate src/main/resources/bench_bands.json — the per-key local
reference bands Bench's band-aware rerun rule reads (r13 verdict task 6).

Usage: python3 tools/make_bands.py --at-round-open [--max-spk S] BENCH_LOCAL_a.json [...]

ROUND-OPEN ONLY (r18 verdict task 7): bands feed the 3×-band rerun
trigger, so regenerating them BETWEEN the two driver runs a verdict
compares changes how many keys are rerun-damped on one side of that
comparison (r18: 255 vs 219 reruns after a mid-cycle regeneration,
biasing the recorded-total ratio). Regenerate only at round OPEN, before
any graded run, and never again within the round; the --at-round-open
flag is the operator's explicit attestation and is recorded in the
artifact's "_when" meta. Cross-round comparisons should read
first_pass_sec (band-independent) when bands changed between rounds.

Each input is a one-line Bench JSON (the checked-in BENCH_LOCAL_* files).
The band for a key is the MEDIAN of its per-run seconds across every run
that contains it (keys newly added since older runs get their band from
the newer runs alone). Run this after each round's closing bench pair so
new keys pick up bands.

CLEAN-SOURCE GATE (r17 verdict task 3): bands feed the 3×-band rerun
trigger, so regenerating them from an elevated-host pair silently raises
every rerun threshold by the elevation factor — weakening spike
detection exactly when the host is flaky (the r17 mistake: bands baked
from a ~1.4×-elevated canary pair). A source run whose seconds-per-key
exceeds --max-spk (default 1.2, the documented clean-band ceiling for
full sf0.1 runs) is REJECTED with its measured s/key; pass a higher gate
explicitly only with a written justification in SCALE.md. The accepted
sources and the gate are recorded INSIDE the bands file as string-valued
meta keys ("_gate", "_sources") — Bench.loadBands' numeric regex ignores
them, and BenchSpec pins that they are present and non-numeric.
"""
import json
import statistics
import sys

OUT = "src/main/resources/bench_bands.json"


def load_bench(path):
    """First parseable non-summary JSON line (see min_merge.load_bench):
    truncated/noise lines are skipped, not fatal (ADVICE r17)."""
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and d.get("metric") != "summary":
                return d
    sys.exit(f"{path}: no bench JSON line found")


def main(argv):
    if not argv or argv[0] != "--at-round-open":
        sys.exit("REFUSED: bands may only be regenerated at round OPEN "
                 "(r18 verdict task 7 — a mid-round regeneration changes "
                 "the rerun-damping behavior between the two runs a verdict "
                 "compares). Re-run with --at-round-open as the FIRST "
                 "argument if and only if no graded run has happened yet "
                 "this round.")
    argv = argv[1:]
    max_spk = 1.2
    if argv and argv[0] == "--max-spk":
        max_spk = float(argv[1])
        argv = argv[2:]
    if not argv:
        sys.exit(__doc__)
    per_key = {}
    accepted = []
    for p in argv:
        q = load_bench(p)["queries"]
        spk = sum(q.values()) / max(len(q), 1)
        if spk > max_spk:
            sys.exit(f"REJECTED band source {p}: {spk:.2f} s/key exceeds the "
                     f"{max_spk} clean gate — an elevated-host run must not "
                     f"set rerun thresholds (r17 verdict task 3)")
        accepted.append(f"{p} ({spk:.2f} s/key)")
        for k, v in q.items():
            per_key.setdefault(k, []).append(v)
    bands = {k: round(statistics.median(vs), 3)
             for k, vs in sorted(per_key.items())}
    # string-valued meta (self-describing artifact): Bench.loadBands'
    # regex only matches numeric values, so these never become bands
    bands["_gate"] = f"max_s_per_key={max_spk}"
    bands["_sources"] = "; ".join(accepted)
    bands["_when"] = "round-open only (r18 verdict task 7; --at-round-open attested)"
    with open(OUT, "w") as fh:
        json.dump(bands, fh, separators=(",", ":"))
    print(f"wrote {len(bands) - 2} bands to {OUT} from {len(argv)} clean "
          f"run(s), gate {max_spk} s/key")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
