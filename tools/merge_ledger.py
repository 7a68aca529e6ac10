#!/usr/bin/env python3
"""Merge parallel ledger-worker shards into the CORRECTNESS_SF10-style
disposition artifact (one line per registry query: verified / vacuous /
oracle-bound / oracle-error / mismatch / spark-error, with rows and
replay seconds where applicable).

Usage: merge_ledger.py <ledgerGlobDir> <oracleSqlJson> <out.json> <sfLabel>
"""
import glob, json, sys


def main():
    led_dir, oracle_path, out_path, sf = sys.argv[1:5]
    oracle = json.load(open(oracle_path))
    # disposition quality ranking: a retry that verifies supersedes a
    # transient-failure record (disk-full / OOM / timeout from an earlier,
    # contended pass) — but a MISMATCH outranks everything, including a
    # later 'verified': a value disagreement observed in any pass is
    # evidence of nondeterminism or a real parity seam and must surface
    # for investigation, never be masked by a retry that happened to
    # agree. When both a mismatch and a verified record exist for the
    # same query, the merged row carries `conflict: true` plus every
    # distinct status seen, and the summary counts it separately.
    rank = {"mismatch": 0, "verified": 1, "vacuous": 2, "oracle-bound": 3,
            "oracle-error": 4, "spark-error": 5, "spark-missing": 6}
    merged = {}
    seen_statuses = {}
    for f in sorted(glob.glob(f"{led_dir}/*.json")):
        for k, v in json.load(open(f)).items():
            seen_statuses.setdefault(k, set()).add(v["status"])
            cur = merged.get(k)
            if cur is None or rank.get(v["status"], 9) < rank.get(cur["status"], 9):
                merged[k] = v
    conflicts = []
    for k, sts in seen_statuses.items():
        if "mismatch" in sts and "verified" in sts:
            merged[k] = dict(merged[k], conflict=True,
                             statuses_seen=sorted(sts))
            conflicts.append(k)
    counts = {}
    for q in sorted(oracle):
        st = merged.get(q, {"status": "unswept"})["status"]
        counts[st] = counts.get(st, 0) + 1
    if conflicts:
        counts["conflict_mismatch_vs_verified"] = len(conflicts)
        print(f"!! CONFLICT (mismatch vs verified across shards): "
              f"{sorted(conflicts)}", file=sys.stderr)
    out = {
        "sf": sf,
        "total": len(oracle),
        "counts": counts,
        "queries": {q: merged.get(q, {"status": "unswept"})
                    for q in sorted(oracle)},
    }
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps(counts, sort_keys=True))


if __name__ == "__main__":
    main()
