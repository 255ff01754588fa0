from .ingest import run_incremental_ingest  # noqa: F401
from .upsert import latest_per_key, run_streaming_upsert  # noqa: F401
from .scd2_ingest import run_streaming_scd2  # noqa: F401
