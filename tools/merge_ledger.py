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
    # contended pass); a mismatch is never masked by anything weaker
    rank = {"verified": 0, "vacuous": 1, "mismatch": 2, "oracle-bound": 3,
            "oracle-error": 4, "spark-error": 5, "spark-missing": 6}
    merged = {}
    for f in sorted(glob.glob(f"{led_dir}/*.json")):
        for k, v in json.load(open(f)).items():
            cur = merged.get(k)
            if cur is None or rank.get(v["status"], 9) < rank.get(cur["status"], 9):
                merged[k] = v
    counts = {}
    for q in sorted(oracle):
        st = merged.get(q, {"status": "unswept"})["status"]
        counts[st] = counts.get(st, 0) + 1
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
