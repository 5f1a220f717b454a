#!/usr/bin/env python3
"""Min-merge Bench JSONs into one artifact (the r15 scale protocol,
now scripted instead of hand-written): the graded number per key is
the per-key MINIMUM across N full runs — the bench's own min-of-two
spike damping applied across sessions, protecting a scale measurement
from the documented host-stall class (SCALE.md "Measured 10x scaling").

Usage: python3 tools/min_merge.py OUT.json RUN1.json RUN2.json [...]

The merged artifact records the execution protocol (cpus, max_heap_mb
from the first run — runs must share a config to be mergeable) plus
the source file list, so a reader can always reconstruct how the
number was produced.
"""
import json
import sys


def main():
    out, paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in paths]
    for r in runs[1:]:
        for f in ("cpus", "max_heap_mb", "sf"):
            if r.get(f) != runs[0].get(f):
                sys.exit(f"refusing to merge runs with different {f}: "
                         f"{r.get(f)} vs {runs[0].get(f)}")
    keys = {}
    for r in runs:
        for k, v in r["queries"].items():
            keys[k] = min(keys.get(k, v), v)
    base = runs[0]
    merged = {
        "metric": "total", "value": round(sum(keys.values()), 3),
        "unit": "sec",
        "errors": sum(r.get("errors", 0) for r in runs),
        "sf": base.get("sf"), "cpus": base.get("cpus"),
        "max_heap_mb": base.get("max_heap_mb"),
        "skipped_demo_quadratics": base.get("skipped_demo_quadratics", []),
        "protocol": f"per-key min over {len(paths)} full runs: "
                    + ", ".join(paths),
        "queries": dict(sorted(keys.items())),
    }
    with open(out, "w") as fh:
        json.dump(merged, fh, separators=(",", ":"))
    print(f"wrote {out}: {len(keys)} keys, total {merged['value']}s "
          f"from {len(paths)} run(s)")


if __name__ == "__main__":
    main()
