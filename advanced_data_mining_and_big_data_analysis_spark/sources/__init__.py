from .catalog import SCHEMAS, TABLES, load_table, register_views
from .readers import read_csv, read_parquet, write_csv_single, write_parquet

__all__ = [
    "SCHEMAS",
    "TABLES",
    "load_table",
    "register_views",
    "read_csv",
    "read_parquet",
    "write_csv_single",
    "write_parquet",
]
