from feast_ray.sources.delta import delta_file_uris, read_delta, write_delta
from feast_ray.sources.iceberg import IcebergTable, read_iceberg
from feast_ray.sources.orc import read_ipc, read_orc, write_ipc, write_orc
from feast_ray.sources.parquet import read_parquet_evolved, read_table, unify_evolved_schemas
from feast_ray.sources.sql import duckdb_factory, read_sql
from feast_ray.sources.warc import parse_warc_stream, read_wet, write_wet
from feast_ray.sources.webpages import synth_webpages, webpages_parquet_dir

__all__ = [
    "read_table",
    "read_parquet_evolved",
    "unify_evolved_schemas",
    "read_orc",
    "write_orc",
    "read_ipc",
    "write_ipc",
    "synth_webpages",
    "webpages_parquet_dir",
    "read_delta",
    "write_delta",
    "delta_file_uris",
    "read_iceberg",
    "IcebergTable",
    "read_sql",
    "duckdb_factory",
    "read_wet",
    "write_wet",
    "parse_warc_stream",
]
