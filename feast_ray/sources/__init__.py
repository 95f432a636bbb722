from feast_ray.sources.parquet import read_table
from feast_ray.sources.webpages import synth_webpages, webpages_parquet_dir

__all__ = ["read_table", "synth_webpages", "webpages_parquet_dir"]
