#!/usr/bin/env python3
"""Label-sharded oracle replay (dev tooling; the engine is pure
Scala/Spark). Closes the sf10 `oracle-bound` rows by decomposing each
DuckDB replay along the SAME blocking key the Spark plan uses (the
label cell): N independent replays each verify one cell's rows against
the corresponding slice of the Spark dump, then a rollup asserts

  (a) every shard hash-matched (columns, rows, canonical values), and
  (b) sum(shard rows) == total dump rows — a row escaping every shard
      (e.g. a NULL label) fails the ledger instead of vanishing.

Exactness of the decomposition is argued (and the shard SQL generated)
on the Scala side: graft.queries.EmbedQueries.shardedOracleSql +
graft.tools.ShardedOracles. Each shard runs in a SUBPROCESS with a
wall-clock timeout and a bounded memory_limit/spill dir, so one heavy
cell cannot take down the sweep.

Usage: sharded_ledger.py <sfDir> <verifyOutDir> <sharded.json>
         <ledger.json> [--timeout SEC] [--threads N] [--memory M]
         [--tempdir D] [--only q1,q2]

The ledger entry for a verified query records status
"verified" with method "label-sharded" plus per-shard row counts and
seconds, mergeable into CORRECTNESS_SF10.json by tools/merge_ledger.py
conventions (a sharded 'verified' carries its method with it).
"""
import json, math, os, re, subprocess, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The compare runs INSIDE DuckDB (multiset equality via EXCEPT ALL in
# both directions over name-aligned projections) instead of the
# fetchall/canonical-string path the one-query ledger uses: a single
# sf10 shard here is ~12M pair rows, and a Python-side sort of that is
# slower than the replay itself. EXCEPT ALL is exact on the same
# engine (both relations are DuckDB values by the time they're
# compared — the Spark side is a parquet scan), spillable, and
# parallel.
WORKER = """
import duckdb, json, os, sys
sf_dir, dump_glob, shard_sql_file, slice_sql_file = sys.argv[1:5]
threads, memory, tempdir = sys.argv[5], sys.argv[6], sys.argv[7]
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

con.execute("CREATE TEMP VIEW want AS " + open(shard_sql_file).read())
con.execute("CREATE TEMP VIEW got AS " + open(slice_sql_file).read())
wc = sorted(r[0] for r in con.execute("DESCRIBE want").fetchall())
gc = sorted(r[0] for r in con.execute("DESCRIBE got").fetchall())
if wc != gc:
    print(json.dumps({"status": "mismatch", "detail": f"columns {gc} != {wc}"}))
    sys.exit(0)
cols = ", ".join(f'"{c}"' for c in wc)
con.execute(f"CREATE TEMP TABLE w AS SELECT {cols} FROM want")
con.execute(f"CREATE TEMP TABLE g AS SELECT {cols} FROM got")
nw = con.execute("SELECT COUNT(*) FROM w").fetchone()[0]
ng = con.execute("SELECT COUNT(*) FROM g").fetchone()[0]
if nw != ng:
    print(json.dumps({"status": "mismatch", "detail": f"rows {ng} != {nw}"}))
    sys.exit(0)
diff = con.execute(
    "SELECT (SELECT COUNT(*) FROM (SELECT * FROM w EXCEPT ALL SELECT * FROM g))"
    " + (SELECT COUNT(*) FROM (SELECT * FROM g EXCEPT ALL SELECT * FROM w))"
).fetchone()[0]
if diff != 0:
    sample = con.execute(
        "SELECT * FROM (SELECT * FROM w EXCEPT ALL SELECT * FROM g) LIMIT 2"
    ).fetchall()
    print(json.dumps({"status": "mismatch",
        "detail": f"{diff} differing rows; oracle-only sample: {sample!r}"[:400]}))
else:
    print(json.dumps({"status": "verified", "rows": nw}))
""" % (TABLES,)


def dump_glob(out_dir, name):
    return f"{out_dir}/{name}/*.parquet"


def total_dump_rows(out_dir, name):
    import duckdb
    con = duckdb.connect()
    return con.execute(
        f"SELECT COUNT(*) FROM '{dump_glob(out_dir, name)}'").fetchone()[0]


def main():
    sf_dir, out_dir, sharded_path, ledger_path = sys.argv[1:5]
    timeout, threads, memory = 2400, "16", "40GB"
    tempdir = "/tmp/duck_spill_sharded"
    only = None
    par = 1
    args = sys.argv[5:]
    while args:
        a = args.pop(0)
        if a == "--timeout": timeout = int(args.pop(0))
        elif a == "--threads": threads = args.pop(0)
        elif a == "--memory": memory = args.pop(0)
        elif a == "--tempdir": tempdir = args.pop(0)
        elif a == "--only": only = set(args.pop(0).split(","))
        elif a == "--par": par = int(args.pop(0))
    # --memory is the TOTAL budget for the sweep: with --par N the N
    # concurrent shard subprocesses each get memory/par, so aggregate
    # commitment never exceeds the budget regardless of parallelism.
    if par > 1:
        m = re.fullmatch(r"(\d+(?:\.\d+)?)\s*([A-Za-z]+)", memory.strip())
        if m:
            per = float(m.group(1)) / par
            if per < 1.0:
                # Flooring per-shard memory at 1 unit would silently
                # commit par*1 > budget (and "1" is unit-blind: 1 of MB
                # vs GB). Respect the budget instead: lower par so each
                # shard gets >= 1 unit, and say so loudly.
                new_par = max(int(float(m.group(1))), 1)
                print(f"== sharded_ledger: WARNING --memory {memory} / "
                      f"--par {par} is < 1{m.group(2)} per shard; "
                      f"lowering --par to {new_par} to stay within the "
                      f"budget", file=sys.stderr)
                par = new_par
                per = float(m.group(1)) / par
            memory = f"{per:g}{m.group(2)}"
            print(f"== sharded_ledger: --par {par} -> {memory} per shard")
    os.makedirs(tempdir, exist_ok=True)
    sharded = json.load(open(sharded_path))
    ledger = {}
    if os.path.exists(ledger_path):
        ledger = json.load(open(ledger_path))
    for name in sorted(sharded):
        if only and name not in only:
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            ledger[name] = {"status": "spark-missing"}
            continue
        if os.path.exists(f"{out_dir}/{name}/_ERROR"):
            ledger[name] = {"status": "spark-error"}
            continue
        spec = sharded[name]
        glob = dump_glob(out_dir, name)
        shard_rows, shard_secs, failures = {}, {}, []

        def run_shard(label):
            shard_sql = spec["shards"][label]
            slice_sql = spec["slice"].replace(
                "__DUMP__", f"'{glob}'").replace("__L__", label)
            sf = f"{tempdir}/_shard_{name}_{label}.sql"
            lf = f"{tempdir}/_slice_{name}_{label}.sql"
            open(sf, "w").write(shard_sql)
            open(lf, "w").write(slice_sql)
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "-c", WORKER, sf_dir, glob, sf, lf,
                     threads, memory, f"{tempdir}/s{label}"],
                    capture_output=True, text=True, timeout=timeout)
                took = round(time.time() - t0, 1)
                rec = None
                pos = (r.stdout or "").rfind('{"status"')
                if r.returncode == 0 and pos >= 0:
                    try:
                        rec = json.loads(r.stdout[pos:].strip().splitlines()[0])
                    except ValueError:
                        rec = None
                if rec is None:
                    err = (r.stderr or "").strip().splitlines()
                    rec = {"status": "oracle-error",
                           "detail": (err[-1] if err else "?")[:300]}
            except subprocess.TimeoutExpired:
                took = timeout
                rec = {"status": "oracle-bound",
                       "detail": f"shard replay exceeded {timeout}s"}
            return label, rec, took

        labels = sorted(spec["shards"], key=lambda s: int(s))
        for d in [f"{tempdir}/s{l}" for l in labels]:
            os.makedirs(d, exist_ok=True)
        # --par N runs N shard subprocesses concurrently (each with its
        # own memory_limit and spill dir); results identical to the
        # sequential form — the rollup is order-independent.
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=max(par, 1)) as pool:
            for label, rec, took in pool.map(run_shard, labels):
                shard_secs[label] = took
                if rec["status"] == "verified":
                    shard_rows[label] = rec["rows"]
                else:
                    failures.append({"shard": label, **rec})
                print(f"  {name}[label={label}]: {rec['status']} "
                      f"({rec.get('rows', '')} rows, {took}s) "
                      f"{rec.get('detail', '')[:180]}", flush=True)
        if failures:
            worst = ("mismatch" if any(f["status"] == "mismatch"
                                       for f in failures)
                     else failures[0]["status"])
            ledger[name] = {"status": worst, "method": "label-sharded",
                            "shard_failures": failures,
                            "shard_rows": shard_rows, "shard_sec": shard_secs}
        else:
            total = total_dump_rows(out_dir, name)
            if sum(shard_rows.values()) != total:
                ledger[name] = {
                    "status": "mismatch", "method": "label-sharded",
                    "detail": f"shard rows sum {sum(shard_rows.values())} "
                              f"!= dump total {total} (rows outside every shard)",
                    "shard_rows": shard_rows, "shard_sec": shard_secs}
            else:
                ledger[name] = {
                    "status": "verified", "method": "label-sharded",
                    "rows": total, "shards": len(shard_rows),
                    "shard_rows": shard_rows,
                    "sec": round(sum(shard_secs.values()), 1),
                    "shard_sec": shard_secs}
        print(f"== {name}: {ledger[name]['status']} "
              f"({ledger[name].get('rows', '')} rows)", flush=True)
        with open(ledger_path, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
    counts = {}
    for v in ledger.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    print("==", counts)


if __name__ == "__main__":
    main()
