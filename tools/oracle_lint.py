#!/usr/bin/env python3
"""Oracle-typing lint: DESCRIBE every oracle query in DuckDB and fail on
column types the correctness harness cannot compare.

Why: the driver's correctness gate hashes TYPED values. Two bug classes
have shipped real red rows:

 * DuckDB widens integer aggregates it cannot prove in-range -- most
   notably window ``SUM(BIGINT)`` -> HUGEINT -- a type Spark parquet
   output can never carry, so a value-identical oracle still hash-fails
   (q47 round 5, q58/q71 round 6).
 * Nested output columns (LIST/STRUCT/MAP) are unhashable in the
   driver's pandas-based row canonicalizer (``TypeError: unhashable
   type: numpy.ndarray``), so even a bitwise-identical result reads as
   red (q96 round 7). One bug class, two entrances: the oracle can emit
   a nested type, or the SPARK side can -- so the lint checks both: the
   oracle's DESCRIBE schema AND (when a Verify output dir is given) the
   schema of every result parquet Verify dumped.

Usage:  python3 tools/oracle_lint.py <sfDir> <oracle_sql.json> [verifyOutDir]
Exit 0 = clean, 1 = violations (printed one per line), 2 = usage error.

Run by OracleLintSpec (sbt test) when python3+duckdb are on the box, and
standalone as part of the local verify loop.
"""
import glob
import json
import os
import re
import sys

# Types DuckDB can bind that the harness cannot compare bitwise:
#  * HUGEINT + the unsigned family -- Spark parquet output never carries
#    them, so the hash can't match (TIMESTAMP is fine; TIME alone would
#    be a problem, but \bTIME\b does not match inside TIMESTAMP);
#  * INTERVAL/UUID/ENUM -- no Spark parquet equivalent either;
#  * nested types -- LIST renders as ``T[]``, plus STRUCT(...)/MAP(...)/
#    UNION(...) -- unhashable in the driver's pandas canonicalizer even
#    when both sides are value-identical.
FORBIDDEN = re.compile(
    r"\b(HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT|"
    r"INTERVAL|UUID|ENUM)\b|\[\]|\b(STRUCT|MAP|UNION)\(")


def check_schema(rows, name, bad):
    for row in rows:
        col, typ = row[0], row[1]
        if FORBIDDEN.search(typ):
            bad.append(f"{name}.{col}: {typ}")


def lint(sf_dir: str, oracle_json: str, verify_dir: str = None) -> int:
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
        check_schema(rows, name, bad)
    n_results = 0
    if verify_dir:
        # Spark-side half of the same net: the schema of every result
        # parquet Verify dumped must be harness-hashable too.
        for d in sorted(glob.glob(os.path.join(verify_dir, "*"))):
            if not os.path.isdir(d):
                continue
            parts = glob.glob(os.path.join(d, "*.parquet"))
            if not parts:
                continue
            n_results += 1
            name = os.path.basename(d)
            try:
                rows = con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{parts[0]}')"
                ).fetchall()
            except Exception as e:
                bad.append(
                    f"{name}: result DESCRIBE failed: "
                    f"{str(e).splitlines()[0]}")
                continue
            check_schema(rows, f"result:{name}", bad)
    for b in bad:
        print(b)
    print(f"[oracle-lint] {len(oracles)} oracles + {n_results} result "
          f"schemas checked, {len(bad)} violations")
    return 1 if bad else 0


if __name__ == "__main__":
    if len(sys.argv) not in (3, 4):
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sys.exit(lint(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) == 4 else None))
