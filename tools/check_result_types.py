"""Cross-engine result-TYPE sweep (round-10; companion to check_oracle.py).

The round-9 driver hash failures were a pure dtype coincidence: the values
agreed but Spark returned int64 where the oracle's HUGEINT reached pandas
as float64, and the driver's stringification split them. This tool sweeps
the whole registry comparing TYPE CLASSES column-by-column:

  Spark schema (lazy build at sf0.001 — no execution for declarative plans)
  vs DuckDB LIMIT-0 bind of the oracle.

Classes: i = integral, f = floating, d = decimal, s = string, t = date/time,
b = boolean. Any column whose class differs across engines is a latent
driver-gate failure even if today's values happen to stringify identically.

Usage: python tools/check_result_types.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_SPARK_CLASS = {
    "byte": "i", "short": "i", "int": "i", "integer": "i", "long": "i",
    "bigint": "i", "float": "f", "double": "f", "string": "s",
    "boolean": "b", "date": "t", "timestamp": "t", "timestamp_ntz": "t",
}


def spark_class(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "d"
    return _SPARK_CLASS.get(dt, "?" + dt)


def duck_class(dt: str) -> str:
    dt = str(dt).upper()
    if "HUGEINT" in dt:
        return "H"  # always wrong — flag loudly
    if dt in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UBIGINT",
              "UINTEGER", "USMALLINT", "UTINYINT"):
        return "i"
    if dt in ("FLOAT", "DOUBLE", "REAL"):
        return "f"
    if dt.startswith("DECIMAL"):
        return "d"
    if dt in ("VARCHAR", "TEXT"):
        return "s"
    if dt == "BOOLEAN":
        return "b"
    if dt in ("DATE",) or dt.startswith("TIMESTAMP"):
        return "t"
    return "?" + dt


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from data_lake_medallion_architecture_project_spark.plans import REGISTRY
    from data_lake_medallion_architecture_project_spark.session import get_spark

    spark = get_spark("check_result_types")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad = []
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        if q.oracle is None:
            continue
        try:
            sdf = q.build(spark, sf_dir)
            s_types = {f.name: spark_class(f.dataType.simpleString())
                       for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"spark build error: {e!r:.120}"))
            continue
        rel = con.sql(f"SELECT * FROM ({q.oracle}) LIMIT 0")
        o_types = {c: duck_class(t) for c, t in zip(rel.columns, rel.types)}
        diffs = []
        for c in sorted(set(s_types) | set(o_types)):
            sc, oc = s_types.get(c, "-"), o_types.get(c, "-")
            # decimal-vs-float and decimal-vs-int stringify differently too
            if sc != oc:
                diffs.append(f"{c}: spark={sc} oracle={oc}")
        if diffs:
            bad.append((name, "; ".join(diffs)))
            print(f"  {name:36s} MISMATCH  {'; '.join(diffs)}")
        else:
            print(f"  {name:36s} ok")

    print(f"\n{len(bad)} queries with type-class mismatches")
    for n, d in bad:
        print(f"  {n}: {d}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
