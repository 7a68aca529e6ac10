#!/usr/bin/env python3
"""Scale-surrogate correctness ledger (dev tooling; the engine is pure
Scala/Spark). Runs every oracle SQL in DuckDB against a scale surrogate
(/tmp/sf10) and compares to the Verify dump, recording ONE disposition
line per registry query:

  verified      rows+schema+values hash-match (rows > 0)
  vacuous       hash-match on ZERO rows at this SF (certifies nothing)
  mismatch      value/row/schema divergence (a real parity bug)
  oracle-bound  the DuckDB replay exceeded the time/disk budget at this
                SF (recorded with the reason; Spark side dumped fine)
  oracle-error  DuckDB failed to execute the oracle SQL

Each oracle runs in a SUBPROCESS with a wall-clock timeout and a spill
budget (temp_directory + memory_limit), so one corpus-scale CTE mirror
cannot take down the sweep. The ledger is written incrementally.

Usage: sf10_ledger.py <sfDir> <verifyOutDir> <ledger.json>
         [--timeout SEC] [--only q1,q2] [--skip-done]
"""
import json, math, os, subprocess, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WORKER = """
import duckdb, json, math, os, sys
sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
threads = sys.argv[4] if len(sys.argv) > 4 else "16"
memory = sys.argv[5] if len(sys.argv) > 5 else "40GB"
tempdir = sys.argv[6] if len(sys.argv) > 6 else "/tmp/duck_spill"
con = duckdb.connect()
con.execute(f"SET temp_directory='{tempdir}'")
con.execute(f"SET memory_limit='{memory}'")
con.execute(f"SET threads TO {threads}")
con.execute("SET enable_progress_bar = false")
for t in %r:
    path = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
gc = [d[0] for d in got.description]; gr = got.fetchall()
want = con.execute(oracle[name])
wc = [d[0] for d in want.description]; wr = want.fetchall()
gck, gk = frame_key(gc, gr)
wck, wk = frame_key(wc, wr)
if gck != wck:
    print(json.dumps({"status": "mismatch", "detail": f"columns {gck} != {wck}"}))
elif len(gk) != len(wk):
    print(json.dumps({"status": "mismatch", "detail": f"rows {len(gk)} != {len(wk)}"}))
elif gk != wk:
    bad = next(i for i in range(len(gk)) if gk[i] != wk[i])
    print(json.dumps({"status": "mismatch",
        "detail": f"row {bad}: spark={gk[bad][:160]} duck={wk[bad][:160]}"}))
elif len(gk) == 0:
    print(json.dumps({"status": "vacuous", "rows": 0}))
else:
    print(json.dumps({"status": "verified", "rows": len(gk)}))
""" % (TABLES,)


def main():
    sf_dir, out_dir, ledger_path = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = 1200
    only = None
    skip_done = False
    threads = "16"
    memory = "40GB"
    tempdir = "/tmp/duck_spill"
    args = sys.argv[4:]
    while args:
        a = args.pop(0)
        if a == "--timeout": timeout = int(args.pop(0))
        elif a == "--only": only = set(args.pop(0).split(","))
        elif a == "--skip-done": skip_done = True
        elif a == "--threads": threads = args.pop(0)
        elif a == "--memory": memory = args.pop(0)
        elif a == "--tempdir": tempdir = args.pop(0)
    os.makedirs(tempdir, exist_ok=True)
    # the ledger's parent must exist BEFORE any replay runs: a missing
    # dir otherwise fails the write after the work is done, and a
    # claim-based driver that marks progress unconditionally would
    # discard the whole sweep (round-17 incident: 188 sf1 replays lost
    # to exactly this)
    parent = os.path.dirname(os.path.abspath(ledger_path))
    os.makedirs(parent, exist_ok=True)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ledger = {}
    if os.path.exists(ledger_path):
        ledger = json.load(open(ledger_path))
    names = sorted(oracle)
    if only: names = [n for n in names if n in only]
    for i, name in enumerate(names):
        if skip_done and name in ledger and \
                ledger[name].get("status") in ("verified", "vacuous", "oracle-bound", "oracle-error", "mismatch"):
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            ledger[name] = {"status": "spark-missing"}
            continue
        if os.path.exists(f"{out_dir}/{name}/_ERROR"):
            ledger[name] = {"status": "spark-error"}
            continue
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", WORKER, sf_dir, out_dir, name,
                 threads, memory, tempdir],
                capture_output=True, text=True, timeout=timeout)
            took = round(time.time() - t0, 1)
            if r.returncode != 0:
                err = (r.stderr or "").strip().splitlines()
                ledger[name] = {"status": "oracle-error", "sec": took,
                                "detail": (err[-1] if err else "?")[:300]}
            else:
                # scan stdout bottom-up for the worker's JSON line (a
                # DuckDB progress/warning line can land on stdout too)
                rec = None
                outs = (r.stdout or "")
                # the JSON can share a line with a progress bar: parse
                # from the last '{"status"' occurrence
                pos = outs.rfind('{"status"')
                if pos >= 0:
                    try:
                        rec = json.loads(outs[pos:].strip().splitlines()[0])
                    except ValueError:
                        rec = None
                if rec is None:
                    rec = {"status": "oracle-error",
                           "detail": "no JSON in worker stdout: " +
                                     (r.stdout or "")[-200:]}
                rec["sec"] = took
                ledger[name] = rec
        except subprocess.TimeoutExpired:
            ledger[name] = {"status": "oracle-bound", "sec": timeout,
                            "detail": f"DuckDB replay exceeded {timeout}s at this SF"}
        print(f"[{i+1}/{len(names)}] {name}: {ledger[name]['status']} "
              f"({ledger[name].get('rows', '')} rows, {ledger[name].get('sec')}s)",
              flush=True)
        with open(ledger_path, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
    counts = {}
    for v in ledger.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    print("==", counts)


if __name__ == "__main__":
    main()
