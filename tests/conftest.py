from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# google.protobuf (the transformWithState worker protocol) is not installed
# in this sandbox, but the Google Cloud SDK on the image bundles a
# pure-python protobuf runtime. Borrow it for the state-API e2e tests: add
# it to sys.path AND PYTHONPATH (Spark's python workers inherit the env, so
# this must happen before the SparkSession is built) and use protobuf's own
# escape hatch for the one-minor-version gencode skew (runtime 6.32 vs
# pyspark's 6.33 gencode — wire-compatible). On a machine with a real
# protobuf install this block is a no-op.
_BUNDLED_PROTOBUF = "/usr/lib/google-cloud-sdk/platform/google_appengine"
try:
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(os.path.join(_BUNDLED_PROTOBUF, "google", "protobuf")):
        sys.path.append(_BUNDLED_PROTOBUF)
        os.environ["PYTHONPATH"] = os.pathsep.join(
            filter(None, [os.environ.get("PYTHONPATH"), _BUNDLED_PROTOBUF])
        )
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"

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
