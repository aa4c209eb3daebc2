#!/usr/bin/env python3
"""Dev-only self-check that mimics the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>.parquet produced by graft.Verify, runs the matching oracle
SQL from oracle_sql.json in DuckDB over the same source tables, sorts columns
by name, and compares values exactly (floats bit-for-bit, which is what a
hash-based compare does). Not part of the shipped library.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_tbl = pq.read_table(f"{out_dir}/{name}")
            want_tbl = con.execute(sql).fetch_arrow_table()
            got_cols = sorted(got_tbl.column_names)
            want_cols = sorted(want_tbl.column_names)
            if got_cols != want_cols:
                print(f"FAIL {name}: columns differ spark={got_cols} duckdb={want_cols}")
                n_fail += 1
                continue
            if got_tbl.num_rows != want_tbl.num_rows:
                print(f"FAIL {name}: rows differ spark={got_tbl.num_rows} duckdb={want_tbl.num_rows}")
                n_fail += 1
                continue
            ok = True
            for c in got_cols:
                g = [norm(v) for v in got_tbl.column(c).to_pylist()]
                w = [norm(v) for v in want_tbl.column(c).to_pylist()]
                if g != w:
                    bad = next(i for i in range(len(g)) if g[i] != w[i])
                    print(f"FAIL {name}: col {c} row {bad}: spark={g[bad]!r} duckdb={w[bad]!r}")
                    ok = False
                    break
            if ok:
                # loose schema check (arrow types)
                gt = {f.name: f.type for f in got_tbl.schema}
                wt = {f.name: f.type for f in want_tbl.schema}
                mism = {c: (str(gt[c]), str(wt[c])) for c in gt if gt[c] != wt[c]}
                tag = f" [type-mismatch {mism}]" if mism else ""
                print(f"PASS {name} ({got_tbl.num_rows} rows){tag}")
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
