from pagerank_mapreduce_implementation_spark.sources.catalog import (
    Catalog,
    load_table,
    read_kv_text,
    read_text_lines,
    write_parquet,
    write_text_kv,
)

__all__ = [
    "Catalog",
    "load_table",
    "read_kv_text",
    "read_text_lines",
    "write_parquet",
    "write_text_kv",
]
