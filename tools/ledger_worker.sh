#!/bin/bash
# One worker of the parallel ledger sweep (dev tooling): repeatedly
# claims the next COMPLETED Verify dump (atomic mkdir in $CLAIMS, with
# the worker pid recorded) and replays its oracle via
# tools/sf10_ledger.py into this worker's own ledger shard. Run K of
# these; merge the shards afterwards.
#
# Claim lifecycle: claim dir created atomically -> `pid` written ->
# ledger run -> `_DONE` touched. A claim with no _DONE whose pid is
# dead is STALE (the worker died mid-run) and is reclaimed by whoever
# sees it first — so a crashed worker cannot leave a query claimed
# forever and silently unswept. Exit condition: every query either has
# a _DONE marker or is claimed by a live worker (which will finish or
# die and be reclaimed on a later scan — workers only exit when no
# in-flight work can fall to them).
set -u
SF_DIR=$1; OUT_DIR=$2; LEDGER=$3; CLAIMS=$4; THREADS=${5:-8}
MEMORY=${6:-16GB}; TIMEOUT=${7:-1200}; TEMPDIR=${8:-/tmp/duck_spill_$$}
mkdir -p "$CLAIMS"
while true; do
  claimed=""
  for q in $(python3 -c "
import json
print(' '.join(sorted(json.load(open('$OUT_DIR/oracle_sql.json')))))"); do
    if [ -d "$CLAIMS/$q" ]; then
      # reclaim a stale claim: no done-marker and the claimer is dead
      if [ ! -f "$CLAIMS/$q/_DONE" ]; then
        cpid=$(cat "$CLAIMS/$q/pid" 2>/dev/null || echo "")
        if [ -n "$cpid" ] && ! kill -0 "$cpid" 2>/dev/null; then
          rm -rf "$CLAIMS/$q"
        else
          continue
        fi
      else
        continue
      fi
    fi
    if [ -f "$OUT_DIR/$q/_SUCCESS" ] || [ -f "$OUT_DIR/$q/_ERROR" ]; then
      if mkdir "$CLAIMS/$q" 2>/dev/null; then
        echo $$ > "$CLAIMS/$q/pid"
        claimed=$q; break
      fi
    fi
  done
  if [ -n "$claimed" ]; then
    # _DONE only on a ledger run that exited cleanly: a crashed run
    # (e.g. an unwritable ledger path) must leave the claim stale so a
    # later worker reclaims it, not mark the query swept with no
    # recorded disposition
    if python3 tools/sf10_ledger.py "$SF_DIR" "$OUT_DIR" "$LEDGER" \
        --threads "$THREADS" --memory "$MEMORY" --timeout "$TIMEOUT" \
        --tempdir "$TEMPDIR" --only "$claimed"; then
      touch "$CLAIMS/$claimed/_DONE"
    else
      rm -rf "$CLAIMS/$claimed"
      echo "== ledger_worker: replay of $claimed exited nonzero; claim released" >&2
      sleep 5
    fi
    continue
  fi
  # nothing claimable: done only if every query is FINISHED (_DONE) or
  # held by a live worker; otherwise wait for dumps / stale reclaims
  left=$(python3 -c "
import json, os
names=sorted(json.load(open('$OUT_DIR/oracle_sql.json')))
left=0
for q in names:
    c='$CLAIMS/'+q
    if os.path.isfile(c+'/_DONE'): continue
    if os.path.isdir(c):
        try: pid=int(open(c+'/pid').read().strip())
        except Exception: pid=None
        alive=False
        if pid is not None:
            try: os.kill(pid,0); alive=True
            except OSError: alive=False
        if alive: continue   # live worker will finish it
    left+=1
print(left)")
  if [ "$left" = "0" ]; then break; fi
  sleep 20
done
echo "== ledger_worker $LEDGER: no more claims"
