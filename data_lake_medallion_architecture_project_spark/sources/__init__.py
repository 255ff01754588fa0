from .readers import load_table, read_bronze_csv, read_silver  # noqa: F401
