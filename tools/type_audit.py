"""Cross-engine output-type audit for every oracle query.

The driver's correctness gate hashes VALUES type-sensitively: a DuckDB
column that widens past 64 bits (HUGEINT — e.g. integer division by a
windowed `SUM(...) OVER ()` or a scalar-subquery SUM) hashes
differently from Spark's BIGINT even when every value is equal. The
local gate compares plain Python values, so this class of bug is
invisible locally and only surfaces as a driver hash-fail (round 7:
`dq_benford_first_digit`; round 8's scan caught six more carriers
before they burned driver window slots).

For each registered oracle this audit builds the DuckDB relation (type
inference only — nothing executes) and the Spark DataFrame, then flags
column-type pairs outside the benign equivalences. Calibrated-benign
pairs (proven by existing green driver rows): DuckDB BIGINT vs Spark
int (`regexp_functions`, green r2) and DuckDB JSON vs Spark string
(`json_roundtrip`, green r3).

Usage: python tools/type_audit.py [sf_dir]   # exits 1 if flagged
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# (duckdb_type, spark_type) pairs that hash identically on the driver
_OK = {
    ("BIGINT", "bigint"),
    ("INTEGER", "int"),
    ("DOUBLE", "double"),
    ("VARCHAR", "string"),
    ("DATE", "date"),
    ("BOOLEAN", "boolean"),
    # calibrated benign by green driver rows (see module docstring):
    ("BIGINT", "int"),
    ("JSON", "string"),
}


def _pair_ok(duck: str, spark: str) -> bool:
    d, s = duck.upper(), spark.lower()
    if (d, s) in _OK:
        return True
    if d.startswith("TIMESTAMP") and s.startswith("timestamp"):
        return True
    if d.startswith("DECIMAL") and s.startswith("decimal"):
        return True
    return False


def main() -> int:
    import duckdb

    from syllabus_sense_spark import queries as q
    from syllabus_sense_spark.session import get_spark
    from syllabus_sense_spark.tables import TABLE_NAMES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    q.load_all_queries()
    spark = get_spark("type-audit")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    flagged = 0
    for name, sql in q.ORACLE.items():
        try:
            rel = con.sql(sql)
            duck = dict(zip(rel.columns, (str(t) for t in rel.types)))
            sk = {
                f.name: f.dataType.simpleString()
                for f in q.QUERIES[name](spark, sf_dir).schema.fields
            }
        except Exception as exc:  # noqa: BLE001 — report, keep scanning
            print(f"ERR  {name}: {type(exc).__name__}: {exc}"[:160])
            flagged += 1
            continue
        for col, dtype in duck.items():
            stype = sk.get(col)
            if stype is None:
                print(f"FLAG {name}.{col}: {dtype} vs MISSING IN SPARK")
                flagged += 1
            elif not _pair_ok(dtype, stype):
                print(f"FLAG {name}.{col}: duckdb {dtype} vs spark {stype}")
                flagged += 1
    print(f"{len(q.ORACLE)} oracles scanned, {flagged} flags")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
