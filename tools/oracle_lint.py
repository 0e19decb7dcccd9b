#!/usr/bin/env python3
"""Oracle-typing lint: DESCRIBE every oracle query in DuckDB and fail on
column types Spark cannot emit.

Why: the driver's correctness gate hashes TYPED values. DuckDB widens
integer aggregates it cannot prove in-range -- most notably window
``SUM(BIGINT)`` -> HUGEINT -- so an oracle that is value-identical to the
Spark result still hash-fails the bitwise gate. This bug class shipped
three times (q47 in round 5, q58/q71 in round 6); this lint makes it
unshippable: every oracle's output schema is bound via ``DESCRIBE``
(no execution) and any column whose type falls outside the
Spark-emittable set fails the run.

Usage:  python3 tools/oracle_lint.py <sfDir> <oracle_sql.json>
Exit 0 = clean, 1 = violations (printed one per line), 2 = usage error.

Run by OracleLintSpec (sbt test) when python3+duckdb are on the box, and
standalone as part of the local verify loop.
"""
import glob
import json
import os
import re
import sys

# Types DuckDB can bind that Spark parquet output can never carry.
# TIMESTAMP is fine (TIME alone would be a problem, but \bTIME\b does not
# match inside TIMESTAMP); HUGEINT and the unsigned family are the ones
# integer widening actually produces.
FORBIDDEN = re.compile(
    r"\b(HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT|"
    r"INTERVAL|UUID|ENUM)\b")


def lint(sf_dir: str, oracle_json: str) -> int:
    import duckdb
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(oracle_json) as f:
        oracles = json.load(f)
    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # a non-binding oracle is itself a failure
            bad.append(f"{name}: DESCRIBE failed: {str(e).splitlines()[0]}")
            continue
        for row in rows:
            col, typ = row[0], row[1]
            if FORBIDDEN.search(typ):
                bad.append(f"{name}.{col}: {typ}")
    for b in bad:
        print(b)
    print(f"[oracle-lint] {len(oracles)} oracles checked, "
          f"{len(bad)} violations")
    return 1 if bad else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sys.exit(lint(sys.argv[1], sys.argv[2]))
