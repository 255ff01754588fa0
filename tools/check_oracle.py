"""Local replica of the driver's correctness gate.

Runs every query in the registry on Spark and its oracle SQL on DuckDB against
the same sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified). Exit non-zero on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Operational notes for large sweeps:
* At sf0.1, exclude the pair-enumeration queries (jaccard/minhash/simhash
  pairs, *_near_dup_pairs, near_dup_clusters, contrastive triples…): their
  DuckDB oracles are deliberately naive-quadratic (or a recursive CTE over
  a ~1M-edge graph) and run for hours on the dup-dense corpus. They are
  gated at sf0.01 and their Spark sides are scale-probed in SCALE.md.
* One observed flake (round 8): a 100+-query single-process sweep hung
  once at ~query 65 (python-side CPU spin; same query instantly green in a
  fresh process and in every later batch). If a long sweep stalls, split
  the query list across two or three invocations.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: None if v is None else str(v))
    return df


def value_hash(df: pd.DataFrame, float_sig: int = 12) -> str:
    """Order-insensitive hash: round floats to float_sig significant digits,
    stringify, sort rows, sha256."""
    df = _normalize(df)
    cells = []
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            cells.append(col.map(lambda v: "null" if pd.isna(v) else format(v, f".{float_sig}g")))
        elif pd.api.types.is_datetime64_any_dtype(col):
            cells.append(col.map(lambda v: "null" if pd.isna(v) else v.isoformat()))
        else:
            cells.append(col.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v)))
    rows = sorted("|".join(vals) for vals in zip(*[c.tolist() for c in cells])) if cells else []
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from data_lake_medallion_architecture_project_spark.plans import REGISTRY
    from data_lake_medallion_architecture_project_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        spark_pdf = q.build(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if q.oracle is None:
            print(f"  {name:32s} rows-only: {len(spark_pdf):>8d} rows  [{t_spark:5.1f}s]")
            continue
        oracle_pdf = con.sql(q.oracle).df()
        problems = []
        if len(spark_pdf) != len(oracle_pdf):
            problems.append(f"rowcount {len(spark_pdf)} vs {len(oracle_pdf)}")
        if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
            problems.append(f"columns {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}")
        else:
            hs, ho = value_hash(spark_pdf), value_hash(oracle_pdf)
            if hs != ho:
                problems.append("value-hash mismatch")
            # Round-9 lesson: identical strings can mask a dtype divergence
            # (DuckDB HUGEINT -> float64 vs Spark int64) that a DIFFERENT
            # hash implementation (the driver's) splits. Flag class drift
            # even when today's hash agrees.
            for c in spark_pdf.columns:
                s_f = pd.api.types.is_float_dtype(spark_pdf[c])
                o_f = pd.api.types.is_float_dtype(oracle_pdf[c])
                if s_f != o_f:
                    problems.append(
                        f"dtype-class drift on {c}: spark={spark_pdf[c].dtype}"
                        f" oracle={oracle_pdf[c].dtype} (latent driver FAIL)"
                    )
        status = "OK " if not problems else "FAIL"
        print(f"  {name:32s} {status} {len(spark_pdf):>8d} rows  [{t_spark:5.1f}s]"
              + (f"  {problems}" if problems else ""))
        if problems:
            failures.append((name, problems, spark_pdf, oracle_pdf))

    for name, problems, spark_pdf, oracle_pdf in failures:
        print(f"\n=== {name}: {problems}")
        s = _normalize(spark_pdf)
        o = _normalize(oracle_pdf)
        key = sorted(s.columns)
        s = s.sort_values(key).reset_index(drop=True)
        o = o.sort_values(key).reset_index(drop=True)
        if len(s) == len(o):
            for c in s.columns:
                neq = (s[c].astype(str) != o[c].astype(str))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col {c}: {int(neq.sum())} diffs; first at row {i}: "
                          f"spark={s[c][i]!r} oracle={o[c][i]!r}")
        else:
            print(s.head(3), "\n--- oracle:\n", o.head(3))

    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
