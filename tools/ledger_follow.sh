#!/bin/bash
# Incremental ledger follower (dev tooling): while graft.Verify is still
# dumping the registry at the scale surrogate, sweep each COMPLETED dump
# (dir contains _SUCCESS or _ERROR) through tools/sf10_ledger.py so the
# DuckDB replay overlaps the Spark dump instead of serializing after it.
# Exits when every oracle query has a ledger disposition.
set -u
SF_DIR=$1; OUT_DIR=$2; LEDGER=$3; THREADS=${4:-8}; TIMEOUT=${5:-1200}
while true; do
  todo=""
  for q in $(python3 -c "
import json,os
oracle=json.load(open('$OUT_DIR/oracle_sql.json'))
led={}
if os.path.exists('$LEDGER'):
    led=json.load(open('$LEDGER'))
done=set(k for k,v in led.items() if v.get('status') not in (None,'spark-missing'))
print(' '.join(sorted(set(oracle)-done)))"); do
    if [ -f "$OUT_DIR/$q/_SUCCESS" ] || [ -f "$OUT_DIR/$q/_ERROR" ]; then
      todo="$todo,$q"
    fi
  done
  todo=${todo#,}
  if [ -n "$todo" ]; then
    python3 tools/sf10_ledger.py "$SF_DIR" "$OUT_DIR" "$LEDGER" \
      --threads "$THREADS" --timeout "$TIMEOUT" --only "$todo"
  fi
  left=$(python3 -c "
import json,os
oracle=json.load(open('$OUT_DIR/oracle_sql.json'))
led={}
if os.path.exists('$LEDGER'):
    led=json.load(open('$LEDGER'))
done=set(k for k,v in led.items() if v.get('status') not in (None,'spark-missing'))
print(len(set(oracle)-done))")
  echo "== ledger_follow: $left queries without a disposition"
  if [ "$left" = "0" ]; then break; fi
  sleep 60
done
echo "== ledger_follow: complete"
