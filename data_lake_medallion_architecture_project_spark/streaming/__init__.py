from .ingest import run_incremental_ingest  # noqa: F401
