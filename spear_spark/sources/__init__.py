"""Sources — table loading for the engine.

The reference has **no file formats and no connectors** (SURVEY §2.3) —
sources are lifted local collections and catalog lookups.  Spark gives
us parquet/csv/json/orc plus streaming sources free; this module adds
the project's testdata conventions.

Scale notes (100 TB design point):
* ``load_table`` returns the raw scan — filters/projections applied by
  callers reach the parquet reader via Catalyst pushdown (verify with
  ``.explain``: ``PushedFilters`` / ``ReadSchema``).
* ``spark.sql.files.maxPartitionBytes`` (set in ``context.DEFAULT_CONF``)
  splits large files into ~128 MB input partitions, so a 100 TB table
  fans out to ~800k tasks — Spark's scheduler handles that; no custom
  partitioning needed at scan time.
* For repeated co-located joins (e.g. lineitem ⋈ orders on orderkey at
  every query), persist bucketed copies via :func:`write_bucketed` —
  bucket joins skip the shuffle entirely.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ntz_as_utc_instant(spark: SparkSession, col_name: str):
    """TIMESTAMP_NTZ column -> TIMESTAMP whose instant is the NTZ wall
    clock read as UTC, in ANY session timezone.

    ``to_utc_timestamp`` would first cast NTZ->TIMESTAMP through the
    SESSION timezone (shifting instants whenever the caller's session
    isn't UTC — the r4 advisor finding); ``convert_timezone`` is
    NTZ-native: it reads the wall clock as UTC and emits the
    session-tz wall clock, so the final cast lands on the identical
    instant regardless of ``spark.sql.session.timeZone``.  The target
    zone is ``current_timezone()`` — NOT a string literal captured at
    build time — so the convert and the cast resolve from the SAME
    conf snapshot even if the session timezone changes between
    DataFrame construction and the action."""
    from pyspark.sql import functions as F

    return F.convert_timezone(
        F.lit("UTC"), F.current_timezone(), F.col(col_name)
    ).cast("timestamp")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (TESTDATA.md layout).

    The events table carries TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects — read nanos as long and surface microsecond
    timestamps (matching DuckDB's ``CAST(ts AS TIMESTAMP)`` truncation).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Parquet written with isAdjustedToUTC=false would be inferred as
    # TIMESTAMP_NTZ (Spark 4 default), which unix_micros()/range frames
    # reject — and which broke every events query in CORRECTNESS_r03 /
    # BENCH_r03.  Reading it as plain TIMESTAMP keeps the stored micros
    # as a UTC instant (exactly what DuckDB's epoch_us(ts) sees), keeps
    # ts predicates pushable into the parquet scan (an expression
    # wrapper like to_utc_timestamp() would block pushdown — a real
    # cost at 100 TB where ts range filters prune row groups), and
    # needs no per-row conversion.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integer division — float division would lose precision on
            # ~1.7e18 nanosecond values (double mantissa is 53 bits)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, TimestampNTZType):
            # fallback if the conf above ever stops applying (e.g. a
            # fixed reader plan): pin the NTZ wall clock to UTC — at
            # the cost of pushdown on this column.
            df = df.withColumn(field.name, ntz_as_utc_instant(spark, field.name))
    return df


def register_tables(spark: SparkSession, sf_dir: str, names: tuple = TABLES) -> None:
    """Expose the testdata star schema as temp views so SQL entry-point
    queries can reference them by name (the reference's catalog
    registration, ``Catalog.scala:18-33``)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame, name: str, bucket_col: str, num_buckets: int = 64, path: str | None = None
) -> None:
    """Persist a bucketed + sorted copy for shuffle-free co-located joins.

    At 100 TB, lineitem ⋈ orders on orderkey is the dominant shuffle;
    bucketing both sides on the join key by the same bucket count turns
    every subsequent sort-merge join into a zero-exchange zipped scan.
    """
    writer = df.write.bucketBy(num_buckets, bucket_col).sortBy(bucket_col).mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written with EVOLVED
    schemas (columns added over time): ``mergeSchema`` unions the file
    footers so old files surface the new columns as nulls.  At 100 TB
    this is how a landing zone written by many pipeline versions stays
    queryable without a rewrite; the per-file footer merge is a
    metadata operation, not a data scan.  ``recursiveFileLookup``
    descends version subdirectories (a flat landing dir works too)."""
    return (
        spark.read.option("mergeSchema", True)
        .option("recursiveFileLookup", True)
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the table-maintenance pass every
    streaming/micro-batch sink needs: rewrite a directory of many
    small parquet files into ceil(total_bytes / target) files of
    roughly target size.  Returns the file count written.

    The file count derives from the ACTUAL on-disk byte size (via the
    Hadoop FS API, so it works on any FileSystem implementation, not
    just local; note ``getContentSummary`` counts _SUCCESS/.crc
    metadata files too — a rounding-up bias of at most one file), and
    the rewrite is one ``repartition(n)`` — a single round-robin
    shuffle, no skew sensitivity, preserving schema and rows exactly.
    At scale this runs per-partition-dir so each date/shard compacts
    independently.

    ``out_path`` must differ from ``path``: the read is lazy and
    ``mode('overwrite')`` deletes the target before the job runs, so
    an in-place compaction would destroy the input.  Compact to a
    sibling directory and swap (an atomic rename on HDFS/local)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    if fs.makeQualified(p).equals(
        fs.makeQualified(jvm.org.apache.hadoop.fs.Path(out_path))
    ):
        raise ValueError(
            f"compact_files: out_path == path ({path!r}) — the lazy "
            "overwrite would delete the input before reading it; "
            "compact to a sibling directory and rename"
        )
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, -(-int(total) // int(target_file_bytes)))
    df = spark.read.parquet(path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
