from pagerank_mapreduce_implementation_spark.sources.catalog import (
    Catalog,
    load_table,
    read_csv,
    read_json,
    read_kv_text,
    read_text_lines,
    write_bucketed,
    write_csv,
    write_json,
    write_parquet,
    write_text_kv,
)

__all__ = [
    "Catalog",
    "load_table",
    "read_csv",
    "read_json",
    "read_kv_text",
    "read_text_lines",
    "write_bucketed",
    "write_csv",
    "write_json",
    "write_parquet",
    "write_text_kv",
]
