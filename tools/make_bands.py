#!/usr/bin/env python3
"""Regenerate src/main/resources/bench_bands.json — the per-key local
reference bands Bench's band-aware rerun rule reads (r13 verdict task 6).

Usage: python3 tools/make_bands.py BENCH_LOCAL_a.json BENCH_LOCAL_b.json [...]

Each input is a one-line Bench JSON (the checked-in BENCH_LOCAL_* files).
The band for a key is the MEDIAN of its per-run seconds across every run
that contains it (keys newly added since older runs get their band from
the newer runs alone). Run this after each round's closing bench pair so
new keys pick up bands.
"""
import json
import statistics
import sys

OUT = "src/main/resources/bench_bands.json"


def load_bench(path):
    """First non-summary JSON line: Bench emits a second compact
    'summary' line after the main artifact (r16 verdict task 3), and a
    raw two-line capture must still parse here."""
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") != "summary":
                return d
    sys.exit(f"{path}: no bench JSON line found")


def main(paths):
    per_key = {}
    for p in paths:
        q = load_bench(p)["queries"]
        for k, v in q.items():
            per_key.setdefault(k, []).append(v)
    bands = {k: round(statistics.median(vs), 3) for k, vs in sorted(per_key.items())}
    with open(OUT, "w") as fh:
        json.dump(bands, fh, separators=(",", ":"))
    print(f"wrote {len(bands)} bands to {OUT} from {len(paths)} run(s)")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
