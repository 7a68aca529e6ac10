#!/usr/bin/env python3
"""Type-parity audit between the Spark results and the DuckDB oracle
(dev tooling only; the engine itself is pure Scala/Spark).

The driver's correctness gate hashes TYPED values, so a DuckDB result
that matches on every value but differs in column type (the classic:
SUM(BIGINT) widens to HUGEINT, and HUGEINT propagates through -, //,
CASE, window frames) still fails the hash compare. The value-level
check (check_oracle.py) cannot see this; this tool can: it DESCRIBEs
every oracle query and diffs the column types against the parquet
schema Spark wrote for the same query.

Usage: check_types.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB type -> the Spark/parquet types it hash-serializes identically to.
OK = {
    "BIGINT": {"int64"},
    "INTEGER": {"int32"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string", "large_string"},
    "BOOLEAN": {"bool"},
    "DATE": {"date32[day]"},
    "TIMESTAMP": {"timestamp[us]", "timestamp[ns]"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp[us, tz=UTC]"},
}


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        duck = {r[0]: r[1] for r in
                con.execute(f"DESCRIBE ({sql})").fetchall()}
        parts = sorted(glob.glob(f"{out_dir}/{name}/part-*.parquet"))
        if not parts:
            # e.g. an empty-result query written with zero part files —
            # report and keep auditing the rest instead of aborting
            print(f"PART {name}: no part-*.parquet under {out_dir}/{name} "
                  f"(duck cols: {sorted(duck)})")
            bad += 1
            continue
        spark = {f.name: str(f.type) for f in pq.read_schema(parts[0])}
        for c in sorted(set(duck) | set(spark)):
            if c not in duck or c not in spark:
                print(f"COLS {name}.{c}: duck={duck.get(c)} "
                      f"spark={spark.get(c)}")
                bad += 1
                continue
            d, s = duck[c], spark[c]
            allowed = OK.get(d)
            base = s.split("[")[0]
            if allowed is None:
                # list/struct/decimal types: compare loosely, flag exotics
                if d.startswith(("HUGEINT", "UHUGEINT", "DECIMAL")):
                    print(f"TYPE {name}.{c}: duck={d} spark={s}")
                    bad += 1
                continue
            if s not in allowed and base not in allowed:
                print(f"TYPE {name}.{c}: duck={d} spark={s}")
                bad += 1
    print(f"== {len(oracle)} queries audited, {bad} type mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
