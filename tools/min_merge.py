#!/usr/bin/env python3
"""Min-merge Bench JSONs into one artifact (the r15 scale protocol,
now scripted instead of hand-written): the graded number per key is
the per-key MINIMUM across N runs — the bench's own min-of-two
spike damping applied across sessions, protecting a scale measurement
from the documented host-stall class (SCALE.md "Measured 10x scaling").

Usage: python3 tools/min_merge.py [--adjudications ADJ.json] \
           OUT.json RUN1.json RUN2.json [...]

Provenance discipline (ADVICE r16): the merged artifact records, per
source run, its keys_run/keys_total/errors, and the protocol string
distinguishes FULL runs (keys_run == keys_total) from TARGETED
single/subset-key reruns — a targeted rerun is legitimate stall
damping only when it is labeled as such; silently calling it a "full
run" is the cherry-picking the docs disclaim. A key listed in a run's
`failed` array contributes NOTHING to the min (a fast failure must
never become the graded minimum); runs must share cpus/heap/sf to be
mergeable.

Failure visibility (ADVICE r17): the merged artifact carries a
top-level `failed` array (the UNION of per-run failed key names) and a
`dropped` array (keys that failed in EVERY run containing them and so
have no graded value at all — previously they vanished silently), and
`errors` counts DROPPED KEYS, not the sum of per-run failure events
(one key failing in both runs is one missing grade, not two); the
per-run event counts stay visible in `sources[].errors`.

Adjudication fields (r17 verdict task 2): when a bench minimum is
demonstrably contaminated (every run of the key hit a documented host
stall window) and separate diagnostic evidence establishes the honest
reading, `--adjudications ADJ.json` attaches a per-key
`adjudicated: {value, source, note}` object — PROVENANCE-LABELED,
never folded into `queries` or `value`: the graded min stays the
graded min, and a reader of the artifact alone can see which keys the
repo's own evidence re-reads, from what artifact, and why.
ADJ.json format: {"key": {"value": s, "source": "path", "note": "…"}}.
"""
import json
import sys


def load_bench(path):
    """First parseable non-summary JSON line: Bench emits a second
    compact 'summary' line after the main artifact (r16 verdict task 3),
    and a raw two-line capture must still parse here. A truncated or
    log-noise line is SKIPPED (ADVICE r17) — the exact capture-
    truncation scenario the two-line format exists for must fall through
    to a usable line or the explicit error, not a JSONDecodeError."""
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


def main():
    argv = sys.argv[1:]
    adj = {}
    if argv and argv[0] == "--adjudications":
        with open(argv[1]) as fh:
            adj = json.load(fh)
        for k, v in adj.items():
            for f in ("value", "source", "note"):
                if f not in v:
                    sys.exit(f"adjudication for {k} missing '{f}'")
        argv = argv[2:]
    if len(argv) < 2:
        sys.exit(__doc__)
    out, paths = argv[0], argv[1:]
    runs = [load_bench(p) for p in paths]
    for r in runs[1:]:
        for f in ("cpus", "max_heap_mb", "sf"):
            if r.get(f) != runs[0].get(f):
                sys.exit(f"refusing to merge runs with different {f}: "
                         f"{r.get(f)} vs {runs[0].get(f)}")
    keys = {}
    failed_union = set()
    seen = set()
    for r in runs:
        failed = set(r.get("failed", []))
        failed_union |= failed
        seen |= set(r["queries"])
        for k, v in r["queries"].items():
            if k in failed:
                continue
            keys[k] = min(keys.get(k, v), v)
    dropped = sorted(seen - set(keys))  # failed in every run that ran them
    unknown_adj = sorted(set(adj) - set(keys))
    if unknown_adj:
        sys.exit(f"adjudications for keys absent from the merge: {unknown_adj}")
    sources = []
    n_full = n_targeted = n_unknown = 0
    for p, r in zip(paths, runs):
        kr = r.get("keys_run", len(r["queries"]))
        kt = r.get("keys_total")
        if kt is None:
            kind = "unknown-coverage"   # pre-r16 artifact without keys_total
            n_unknown += 1
        elif kr == kt:
            kind = "full"
            n_full += 1
        else:
            kind = "targeted"
            n_targeted += 1
        sources.append({"path": p, "kind": kind, "keys_run": kr,
                        "keys_total": kt, "errors": r.get("errors", 0)})
    base = runs[0]
    merged = {
        "metric": "total", "value": round(sum(keys.values()), 3),
        "unit": "sec",
        "errors": len(dropped),
        "failed": sorted(failed_union),
        "dropped": dropped,
        "sf": base.get("sf"), "cpus": base.get("cpus"),
        "max_heap_mb": base.get("max_heap_mb"),
        "skipped_demo_quadratics": base.get("skipped_demo_quadratics", []),
        "protocol": f"per-key min over {n_full} full run(s)"
                    + (f" + {n_targeted} targeted subset rerun(s)"
                       if n_targeted else "")
                    + (f" + {n_unknown} run(s) of unrecorded coverage"
                       if n_unknown else "")
                    + "; failed keys excluded from the min"
                    + ("; adjudicated keys carry diagnostic re-readings "
                       "(NOT folded into queries/value)" if adj else "")
                    + "; see sources",
        "sources": sources,
        "queries": dict(sorted(keys.items())),
    }
    if adj:
        merged["adjudicated"] = {k: adj[k] for k in sorted(adj)}
    with open(out, "w") as fh:
        json.dump(merged, fh, separators=(",", ":"))
    print(f"wrote {out}: {len(keys)} keys, total {merged['value']}s from "
          f"{n_full} full + {n_targeted} targeted + {n_unknown} unknown run(s)"
          + (f"; dropped={dropped}" if dropped else "")
          + (f"; adjudicated={sorted(adj)}" if adj else ""))


if __name__ == "__main__":
    main()
