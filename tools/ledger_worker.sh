#!/bin/bash
# One worker of the parallel ledger sweep (dev tooling): repeatedly
# claims the next COMPLETED Verify dump (atomic mkdir in $CLAIMS) and
# replays its oracle via tools/sf10_ledger.py into this worker's own
# ledger shard. Run K of these; merge the shards afterwards. Exits when
# every oracle query has been claimed (by anyone) and its dump was
# processed or will be by the claimer.
set -u
SF_DIR=$1; OUT_DIR=$2; LEDGER=$3; CLAIMS=$4; THREADS=${5:-8}
MEMORY=${6:-16GB}; TIMEOUT=${7:-1200}; TEMPDIR=${8:-/tmp/duck_spill_$$}
mkdir -p "$CLAIMS"
while true; do
  claimed=""
  for q in $(python3 -c "
import json
print(' '.join(sorted(json.load(open('$OUT_DIR/oracle_sql.json')))))"); do
    [ -d "$CLAIMS/$q" ] && continue
    if [ -f "$OUT_DIR/$q/_SUCCESS" ] || [ -f "$OUT_DIR/$q/_ERROR" ]; then
      if mkdir "$CLAIMS/$q" 2>/dev/null; then claimed=$q; break; fi
    fi
  done
  if [ -n "$claimed" ]; then
    python3 tools/sf10_ledger.py "$SF_DIR" "$OUT_DIR" "$LEDGER" \
      --threads "$THREADS" --memory "$MEMORY" --timeout "$TIMEOUT" \
      --tempdir "$TEMPDIR" --only "$claimed"
    continue
  fi
  # nothing claimable: done if every query is claimed, else wait for dumps
  left=$(python3 -c "
import json, os
names=sorted(json.load(open('$OUT_DIR/oracle_sql.json')))
print(sum(1 for q in names if not os.path.isdir('$CLAIMS/'+q)))")
  if [ "$left" = "0" ]; then break; fi
  sleep 20
done
echo "== ledger_worker $LEDGER: no more claims"
