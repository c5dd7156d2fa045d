"""Sources & sinks.

Covers the reference's full I/O surface (SURVEY.md §2.3):

- O1  text line scan            -> ``read_text_lines``
- O2  K/V tab-delimited scan    -> ``read_kv_text``
- O3  text sink (``k \\t v``)    -> ``write_text_kv``
- O4  overwrite management      -> ``mode("overwrite")`` everywhere
      (the reference hand-deletes output dirs, PageRank.java:69-80,222-228)

plus the engine-native Parquet catalog over the driver test tables.
Parquet is the primary format at scale: columnar, splittable, predicate
pushdown + column pruning reach the scan (check ``PushedFilters`` /
``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_mapreduce_implementation_spark import schemas

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates INT64 TIMESTAMP(NANOS) columns under
    ANY SparkSession — not just the engine's own ``session.get_spark``.

    The events table stores ``ts`` as TIMESTAMP(NANOS); vanilla Spark 4
    raises PARQUET_TYPE_ILLEGAL unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set. It is a runtime SQL
    conf, so set it here at load time (harness/driver sessions don't run
    session.py). The confs set here stay set for the session — see
    ``load_table``'s docstring; they are NOT restored after the read,
    deliberately: nanosAsLong is consulted again at execution time (a
    restore would break the very DataFrame this returned), and a
    flip-flopping timezone would make two loads of the same table
    render timestamps differently. If a Spark build rejects the conf,
    the set is skipped and plain (non-nanos) tables still read fine;
    nanos tables then raise the upstream PARQUET_TYPE_ILLEGAL error.
    """
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        spark.conf.set(conf_key, "true")
    except Exception:
        # Conf rejected (future Spark): plain tables still read fine;
        # nanos tables will raise with the upstream error message.
        pass
    try:
        # Pin the session timezone where the data is loaded, for the
        # same reason nanosAsLong is set here: the harness/driver
        # builds its own session. to_date/date_format/window render in
        # the session zone, while the DuckDB oracle treats the naive
        # timestamps as UTC — on a non-UTC box, midnight-adjacent
        # events would otherwise bucket into different days.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    return spark.read.parquet(path)


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one of the driver test tables as a DataFrame.

    Schema is validated against ``schemas.TABLES`` (names + order); the
    reference had only implicit positional schemas (SURVEY.md §1.2), the
    engine fails fast on drift instead.

    Session-wide side effect (deliberate, documented): loading pins
    ``spark.sql.session.timeZone=UTC`` and
    ``spark.sql.legacy.parquet.nanosAsLong=true`` on the CALLING
    session for the rest of its lifetime. The engine's own sessions
    (session.get_spark) already run with both; the pin exists so
    harness/driver-built sessions read the nanos ``events.ts`` column
    and bucket midnight-adjacent timestamps identically to the UTC-naive
    DuckDB oracle. Callers that need a different session timezone must
    set it after their last load_table call.
    """
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    df = _read_parquet_nanos_safe(spark, f"{sf_dir}/{name}.parquet")
    expected = schemas.TABLES.get(name)
    if expected is not None:
        got = [f.name for f in df.schema.fields]
        want = [f.name for f in expected.fields]
        if got != want:
            raise ValueError(f"schema drift for {name}: expected {want}, got {got}")
        # TIMESTAMP(NANOS) parquet columns arrive either as long (Spark
        # <=4.0 with nanosAsLong) or as TIMESTAMP_NTZ (Spark 4.1+ reads
        # nanos natively, truncated to micros, and IGNORES the legacy
        # conf) — normalize both to the declared micros TIMESTAMP.
        # Long path: floor-division matches DuckDB's nanos->micros
        # truncation. NTZ path: the session zone is pinned UTC above,
        # so the cast is field-value-preserving and yields the same
        # instants as the long path.
        for f_exp, f_got in zip(expected.fields, df.schema.fields):
            import pyspark.sql.types as T

            if isinstance(f_exp.dataType, T.TimestampType):
                if isinstance(f_got.dataType, T.LongType):
                    df = df.withColumn(
                        f_exp.name, F.timestamp_micros(F.expr(f"{f_exp.name} DIV 1000"))
                    )
                elif isinstance(f_got.dataType, T.TimestampNTZType):
                    df = df.withColumn(
                        f_exp.name, F.col(f_exp.name).cast("timestamp")
                    )
    return df


class Catalog:
    """Lazy handle to all tables at one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None) -> None:
        self.spark = spark
        self.sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, name, self.sf_dir)

    def __getattr__(self, name: str) -> DataFrame:
        if name in schemas.TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view so users can query the
        catalog with raw ``spark.sql(...)`` — the full Spark SQL surface
        (joins, windows, CTEs, set ops) over the engine's tables."""
        for name in schemas.TABLES:
            self.table(name).createOrReplaceTempView(name)


# --- reference text I/O surface --------------------------------------------


def read_text_lines(spark: SparkSession, *paths: str) -> DataFrame:
    """O1: line-oriented text scan (PageRank.java:94,164).

    Multiple paths behave like the reference's ``addInputPaths``
    (union of files). Returns one ``line: string`` column; the byte
    offset key of TextInputFormat carries no information downstream in
    the reference and is dropped.
    """
    return spark.read.text(list(paths)).withColumnRenamed("value", "line")


def read_kv_text(spark: SparkSession, *paths: str) -> DataFrame:
    """O2: tab-delimited key/value scan (KeyValueTextInputFormat,
    PageRank.java:232,293). Splits on the FIRST tab only, like Hadoop."""
    lines = read_text_lines(spark, *paths)
    parts = F.split(F.col("line"), "\t", 2)
    return lines.select(
        parts.getItem(0).alias("key"),
        F.coalesce(parts.getItem(1), F.lit("")).alias("value"),
    )


def write_text_kv(df: DataFrame, path: str, key: str, value: str) -> None:
    """O3+O4: ``key \\t value`` text sink with overwrite (TextOutputFormat,
    PageRank.java:233,294; dir cleanup :69-80)."""
    out = df.select(F.concat_ws("\t", F.col(key).cast("string"), F.col(value).cast("string")).alias("value"))
    out.write.mode("overwrite").text(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Engine-native sink. ``partition_by`` gives partition pruning on
    re-read — the 100 TB path for any recurring filter column."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    partition_by: list[str] | None = None,
    num_files: int | None = None,
) -> None:
    """Layout-optimized parquet sink (the "CLUSTER BY" story): range-
    repartition on ``cluster_by`` then sort within each output file on
    the same keys, so every parquet row group carries NARROW, mostly
    non-overlapping min/max statistics on those columns. A predicate
    on a clustered column then prunes at THREE levels on re-read —
    hive partition dirs (``partition_by``), whole files (footer
    stats), and row groups inside surviving files — instead of
    brute-scanning; at 100 TB this is the difference between touching
    one file and touching ten thousand for a time-range or key-range
    query. The write costs ONE range-exchange (sampled boundaries,
    skew-tolerant) plus a per-partition sort — paid once at ingest,
    recouped on every subsequent scan.

    ``num_files`` overrides the range partition count (default:
    ``spark.sql.shuffle.partitions``); size it to the target
    file size at the expected data volume.
    """
    cols = [F.col(c) for c in cluster_by]
    clustered = (
        df.repartitionByRange(num_files, *cols)
        if num_files is not None
        else df.repartitionByRange(*cols)
    ).sortWithinPartitions(*cols)
    writer = clustered.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 10,
    num_files: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Z-ORDER layout sink: the multi-column generalization of
    ``write_clustered_parquet``. Range clustering gives perfect
    pruning on ONE key and none on the others; interleaving the bits
    of several keys' rank buckets onto a space-filling curve gives
    each of them PARTIAL locality, so a conjunctive 2-D predicate
    (user range AND value range) prunes files/row groups on BOTH
    columns — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` story, paid
    once at ingest.

    Mechanics, all pure column expressions: each key is min/max
    scaled into a ``bits``-bit bucket (ONE bounded 1-row aggregate
    collect supplies the bounds — layout metadata, not data; NULLs
    land in bucket 0), the buckets' bits are interleaved
    little-endian into the z-key, and the frame is range-partitioned
    + sorted on that key, then the key is dropped. The curve only
    shapes LAYOUT — values are written untouched, so readers are
    oblivious (and the round-trip oracle is the plain filter).
    """
    if not zorder_by or len(zorder_by) < 2:
        raise ValueError("zorder_by needs at least two columns")
    if bits <= 0 or bits * len(zorder_by) > 63:
        raise ValueError(
            f"bits ({bits}) x columns ({len(zorder_by)}) must fit a signed long"
        )
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(zorder_by)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(zorder_by)],
    ).collect()[0]
    top = (1 << bits) - 1
    buckets = []
    for i, c in enumerate(zorder_by):
        mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
        if mn is None or mx is None or mx <= mn:
            buckets.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn) * F.lit(float(top))
        buckets.append(
            F.coalesce(
                F.least(F.lit(top).cast("long"), F.greatest(F.lit(0).cast("long"), F.floor(scaled))),
                F.lit(0).cast("long"),
            )
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, bucket in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1).cast("long")),
                    b * len(buckets) + i,
                )
            )
    keyed = df.withColumn("__z", z)
    clustered = (
        keyed.repartitionByRange(num_files, F.col("__z"))
        if num_files is not None
        else keyed.repartitionByRange(F.col("__z"))
    ).sortWithinPartitions("__z").drop("__z")
    writer = clustered.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table (parquet + bucket metadata in the session
    catalog): the co-located-join primitive. Two tables bucketed on the
    same key with the same bucket count join WITHOUT a shuffle — at
    100 TB this turns every recurring fact-to-fact join on that key
    from two full-table exchanges into a zero-exchange zip of bucket
    files. ``sort_cols`` additionally pre-sorts within buckets, letting
    sort-merge joins skip the sort.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """CSV scan with an EXPLICIT schema (DDL string). Schema inference
    is banned on the engine's ingest path: at 100 TB inference is an
    extra full pass over the data, and a drifting inferred type
    corrupts silently downstream — fail fast instead (badRecordsPath /
    PERMISSIVE corrupt-record capture can be layered by callers)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines scan with an explicit schema; malformed rows become
    NULLs (PERMISSIVE default) rather than failing the scan."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    out = df.write.mode("overwrite").option("header", str(header).lower())
    out.csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar format a warehouse migration
    brings along (Hive-era tables). Spark's native vectorized ORC
    reader: predicate pushdown + column pruning work exactly as for
    parquet, so every operator in this engine runs over ORC inputs
    unchanged."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink, same contract as write_parquet (overwrite; optional
    hive-style partition dirs for partition-pruned scans)."""
    out = df.write.mode("overwrite")
    if partition_by:
        out = out.partitionBy(*partition_by)
    out.orc(path)
