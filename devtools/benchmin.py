#!/usr/bin/env python3
"""Refresh a rolling bench baseline from the per-query MINIMUM across
several same-SF, same-code runs (VERDICT r14 #2 / ENGINE.md bench
notes): the min is the least-contended sample per query on a co-tenant
box, so the next round's 2x regression gate bites at the plan's real
cost instead of whatever contention inflated one recording run.
BenchGate.settle already scores flagged queries by min-across-reruns;
this applies the same principle to the baseline artifact itself.

Usage: benchmin.py OUT RUN1 RUN2 [RUN3 ...]
Writes OUT in Bench's contract-line shape (same fields as RUN1, with
queries/builds replaced by the element-wise minima and `value` by the
min-query sum). Refuses runs whose sf or query sets differ.
"""
import json, sys


def main() -> None:
    out, paths = sys.argv[1], sys.argv[2:]
    assert len(paths) >= 2, "need at least two runs to take a minimum"
    runs = [json.load(open(p)) for p in paths]
    sfs = {r["sf"] for r in runs}
    assert len(sfs) == 1, f"mixed scale factors: {sfs}"
    keysets = [set(r["queries"]) for r in runs]
    assert all(k == keysets[0] for k in keysets), (
        "query sets differ across runs: "
        f"{set.union(*keysets) - set.intersection(*keysets)}")
    base = runs[0]
    # element-wise minima, ignoring the -1 error sentinel (a query that
    # errored in one run but measured in another keeps the measurement)
    def best(vals):
        ok = [v for v in vals if v >= 0]
        return min(ok) if ok else -1.0
    queries = {k: best([r["queries"][k] for r in runs])
               for k in base["queries"]}
    builds = {k: best([r.get(k, -1.0) for r in runs])
              for k in base if k.endswith("_build")}
    errs = [r["errors"] for r in runs if r.get("errors")]
    assert not errs, f"refusing to bake a baseline from errored runs: {errs}"
    line = {
        "metric": "total",
        "value": sum(v for v in queries.values() if v >= 0),
        "unit": "sec",
        "queries": queries,
        **builds,
        "errors": {},
        "sf": base["sf"],
        # the per-run gates were already enforced when the runs landed;
        # record the provenance instead of a fake re-evaluation
        "gate": {"prev": "min-of-%d-runs" % len(runs), "factor": 2.0,
                 "regressions": {}, "builds": {}, "reruns": {},
                 "pass": all(r["gate"]["pass"] for r in runs)},
    }
    with open(out, "w") as f:
        f.write(json.dumps(line, separators=(",", ":")) + "\n")
    print(f"{out}: {line['value']:.1f} s query-sum "
          f"(min over {len(paths)} runs; inputs "
          f"{[round(r['value'], 1) for r in runs]})")


if __name__ == "__main__":
    main()
