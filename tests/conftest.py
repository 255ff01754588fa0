from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_lake_medallion_architecture_project_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


def bronze_df(spark, rows, domain):
    """Build a Bronze-schema DataFrame from generator row dicts, coercing ints
    to float where the schema declares DoubleType (CSV round-trip parity)."""
    from pyspark.sql.types import DoubleType

    from data_lake_medallion_architecture_project_spark.schemas import BRONZE_SCHEMAS

    schema = BRONZE_SCHEMAS[domain]
    out = []
    for r in rows:
        vals = []
        for f in schema.fields:
            v = r.get(f.name)
            if v is not None and isinstance(f.dataType, DoubleType):
                v = float(v)
            vals.append(v)
        out.append(tuple(vals))
    return spark.createDataFrame(out, schema)
