#!/usr/bin/env python3
"""Convert a scripts/check.py output log into the committed
CORRECTNESS_sf1.json artifact (same per-query shape as the driver's
CORRECTNESS_r{N}.json: pass/fail plus row counts or the failure reason).

Usage: python3 scripts/sf1_artifact.py <check_log> <out_json> [notes_json]
"""
import json, re, sys


def main():
    log, out = sys.argv[1], sys.argv[2]
    notes = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}
    results = {}
    for line in open(log):
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            results[m.group(1)] = {
                "pass": True, "rows": int(m.group(2)), "err": None}
            continue
        m = re.match(r"(FAIL|ERROR) (\S+?):? (.*)", line)
        if m:
            name = m.group(2).rstrip(":")
            results[name] = {
                "pass": False, "rows": None,
                "err": m.group(3).strip()[:300],
                "note": notes.get(name)}
    n_pass = sum(1 for r in results.values() if r["pass"])
    artifact = {
        "gate": "sf1",
        "sf_dir": "scratch/sf1 (DeriveSf1: 10x key-offset replication of sf0.1)",
        "n_queries": len(results),
        "n_pass": n_pass,
        "n_fail": len(results) - n_pass,
        "queries": dict(sorted(results.items())),
    }
    json.dump(artifact, open(out, "w"), indent=1)
    print(f"wrote {out}: {n_pass}/{len(results)} pass")


if __name__ == "__main__":
    main()
