#!/usr/bin/env python3
"""Local replay of the driver's correctness compare.

For each query dumped by ``graft.Verify`` into <outDir>/<name>/ (parquet)
with oracles in <outDir>/oracle_sql.json: run the oracle in DuckDB over the
sf dir's parquet tables, then compare against the Spark output on
  * row count,
  * schema (column names + DuckDB-bound types, sorted by name),
  * typed values (sorted columns, sorted rows -- a hash over the CSV of the
    canonicalized frame, which is bitwise-strict like the driver's gate).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [nameRegex]
Exit 0 = all compared queries match, 1 = any mismatch.
"""
import glob
import hashlib
import json
import os
import re
import sys

import duckdb


def canon(con, rel_sql):
    """name-sorted columns, row-sorted typed CSV + schema of a relation."""
    desc = con.execute(f"DESCRIBE {rel_sql}").fetchall()
    cols = sorted(r[0] for r in desc)
    types = {r[0]: r[1] for r in desc}
    collist = ", ".join(f'"{c}"' for c in cols)
    rows = con.execute(
        f"SELECT {collist} FROM ({rel_sql}) ORDER BY ALL").fetchall()
    h = hashlib.sha256()
    for row in rows:
        h.update(repr(row).encode())
    return len(rows), [(c, types[c]) for c in cols], h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    pat = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    bad = 0
    names = [n for n in sorted(oracles) if pat is None or pat.search(n)]
    for name in names:
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"{name}: MISSING spark output")
            bad += 1
            continue
        try:
            o_rows, o_schema, o_hash = canon(con, f"({oracles[name]})")
            s_rows, s_schema, s_hash = canon(
                con, f"(SELECT * FROM read_parquet('{spark_glob}'))")
        except Exception as e:
            print(f"{name}: ERROR {str(e).splitlines()[0]}")
            bad += 1
            continue
        ok_rows = o_rows == s_rows
        ok_schema = o_schema == s_schema
        ok_hash = o_hash == s_hash
        if ok_rows and ok_schema and ok_hash:
            print(f"{name}: OK ({s_rows} rows)")
        else:
            bad += 1
            print(f"{name}: MISMATCH rows={s_rows}/{o_rows} "
                  f"schema_match={ok_schema} hash_match={ok_hash}")
            if not ok_schema:
                print(f"  spark:  {s_schema}")
                print(f"  oracle: {o_schema}")
    print(f"[compare] {len(names)} compared, {bad} mismatching")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
