#!/usr/bin/env python3
"""Compare a fresh graft.Bench record against a committed one, using the
committed record's per-query spread to separate environmental jitter from
real regressions.

Usage: python3 tools/bench_compare.py BENCH_FULL.json /tmp/bench_new.json

Verdict policy (per query, on medians):
  - OK        : new med <= committed spread max, or within 1.5x committed med
  - JITTER    : new med above both, but the committed spread itself was wide
                (max > 2x med) -- the query is known-noisy on this box
  - REGRESSED : new med > committed max AND > 2x committed med on a
                narrow-spread query -- not explainable by recorded noise

Exit code 1 iff any query REGRESSED (so CI/driver use is one line).
"""
import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    committed = json.load(open(sys.argv[1]))
    fresh = json.load(open(sys.argv[2]))
    spread = committed.get("spread", {})
    regressed, jitter = [], []
    for q, med in sorted(committed["queries"].items()):
        new = fresh["queries"].get(q)
        if new is None:
            print(f"missing  {q}: not in fresh record")
            regressed.append(q)
            continue
        if new < 0 or med < 0:
            print(f"failed   {q}: committed={med} fresh={new}")
            regressed.append(q)
            continue
        sp = spread.get(q, {"med": med, "min": med, "max": med})
        if new <= max(sp["max"], 1.5 * med):
            continue
        if sp["max"] > 2 * sp["med"]:
            jitter.append(q)
            print(f"jitter   {q}: fresh {new:.2f}s vs committed med {med:.2f}s "
                  f"(known-noisy: committed max {sp['max']:.2f}s)")
        else:
            regressed.append(q)
            print(f"REGRESSED {q}: fresh {new:.2f}s vs committed med {med:.2f}s "
                  f"max {sp['max']:.2f}s")
    n = len(committed["queries"])
    print(f"total: committed {committed['value']:.1f}s fresh {fresh['value']:.1f}s over {n} queries; "
          f"{len(regressed)} regressed, {len(jitter)} known-noisy outliers")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
