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
# forever and silently unswept. A query whose replay exits nonzero
# MAX_FAILS (default 3) consecutive times is marked _FAILED — terminal,
# never reclaimed — so a deterministic failure can't retry forever.
# Exit condition: every query either has a _DONE/_FAILED marker or is
# claimed by a live worker (which will finish or die and be reclaimed
# on a later scan — workers only exit when no in-flight work can fall
# to them).
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
      # reclaim a stale claim: no terminal marker and the claimer is dead
      if [ ! -f "$CLAIMS/$q/_DONE" ] && [ ! -f "$CLAIMS/$q/_FAILED" ]; then
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
      rm -f "$CLAIMS/.fails_$claimed"
    else
      # Bound retries: a deterministic failure (bad SQL, OOM) must not
      # loop forever. After MAX_FAILS consecutive nonzero exits the
      # claim is marked _FAILED (terminal — skipped by the claim scan
      # and counted as finished by the exit check) instead of released.
      fails=$(( $(cat "$CLAIMS/.fails_$claimed" 2>/dev/null || echo 0) + 1 ))
      echo "$fails" > "$CLAIMS/.fails_$claimed"
      if [ "$fails" -ge "${MAX_FAILS:-3}" ]; then
        touch "$CLAIMS/$claimed/_FAILED"
        echo "== ledger_worker: replay of $claimed failed $fails times; marked _FAILED" >&2
      else
        rm -rf "$CLAIMS/$claimed"
        echo "== ledger_worker: replay of $claimed exited nonzero ($fails/${MAX_FAILS:-3}); claim released" >&2
        sleep 5
      fi
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
    if os.path.isfile(c+'/_DONE') or os.path.isfile(c+'/_FAILED'): continue
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
# A _FAILED marker means a query was never verified: the sweep is
# INCOMPLETE and must say so machine-readably — exit nonzero so a
# wrapper (or a 190/190 verdict script) can't mistake a gapped sweep
# for a clean one. The markers stay in $CLAIMS for inspection/retry.
failed=$(ls -d "$CLAIMS"/*/_FAILED 2>/dev/null | sed 's|.*/\([^/]*\)/_FAILED|\1|' | tr '\n' ' ')
if [ -n "$failed" ]; then
  echo "== ledger_worker $LEDGER: INCOMPLETE — _FAILED queries: $failed" >&2
  exit 1
fi
echo "== ledger_worker $LEDGER: no more claims"
