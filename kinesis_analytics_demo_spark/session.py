"""SparkSession factory and table loading.

Mirrors the reference's environment construction
(reference flink/tumbling_window.py:40-60: streaming-mode env, Blink
planner, parallelism) but Spark-first: one session powers both the
batch SQL surface and Structured Streaming, Catalyst/Tungsten replace
the Blink planner, and parallelism is expressed as shuffle-partition /
AQE settings rather than a fixed operator parallelism.

Scale notes (100 TB design, local[32] testing):
- AQE is always on: runtime partition coalescing and skew-join
  splitting replace hand-tuned shuffle partition counts per query.
- ``spark.sql.shuffle.partitions`` is a *ceiling* under AQE, so it is
  set generously and coalesced at runtime; on a real cluster this
  should be ~2-3x total executor cores.
- Arrow is enabled for every pandas-UDF boundary (the dedup /
  similarity slow paths).
- Session timezone is pinned to UTC so event-time semantics match the
  reference's millisecond UTC timestamps (reference
  flink/tumbling_window.py:118-119) and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The driver-provided test tables (TPC-H-ish star schema + events +
#: documents/embeddings for the LLM-data operators). See TESTDATA.md.
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "kinesis-analytics-demo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Equivalent role to the reference's
    ``EnvironmentSettings.new_instance().in_streaming_mode()
    .use_blink_planner().build()`` + ``StreamTableEnvironment.create``
    (reference flink/tumbling_window.py:40-46), with cluster-scale
    defaults instead of ``parallelism.default=1``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    # Local-mode driver and executors share one JVM; its heap defaults
    # to 1g. Counter-intuitively, raising it to 16g measured *no
    # faster* (slightly slower) on the sf0.1 suite — the working set is
    # small and MEMORY_AND_DISK persists spill gracefully — so the
    # default is left alone and the knob is opt-in for bigger local
    # runs. Only effective when this call creates the JVM.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    )
    if driver_mem:
        builder = builder.config("spark.driver.memory", driver_mem)
    builder = (
        builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable conf to an externally-created
    session (e.g. the driver's). Only touches settings that are safe to
    change mid-session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # An externally-created session defaults to 200 shuffle partitions;
    # right-size to the actual core count (AQE coalesces further).
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    # The driver test data stores events.ts as TIMESTAMP(NANOS), which
    # Spark's parquet reader rejects; read as INT64 nanos and convert
    # (see read_table).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) (footer-only
    metadata read — cheap even when `path` is 100 TB of files, as only
    one footer is consulted)."""
    if path in _NANOS_CACHE:
        return _NANOS_CACHE[path]
    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                target = os.path.join(path, f)
                break
    # Inspect the PARQUET schema, not the arrow-mapped one: pyarrow
    # reports legacy INT96 timestamps (Spark's own default writer
    # output) as timestamp[ns] too, but Spark reads INT96 natively —
    # only INT64 columns annotated TIMESTAMP(NANOS) need the
    # nanosAsLong + div-1000 normalization.
    sch = pq.ParquetFile(target).schema
    cols = []
    for i in range(len(sch)):
        col = sch.column(i)
        lt = col.logical_type
        if (
            col.physical_type == "INT64"
            and lt.type == "TIMESTAMP"
            and getattr(lt, "unit", None) == "nanoseconds"
        ):
            cols.append(col.name)
    _NANOS_CACHE[path] = cols
    return cols


_NANOS_CACHE: dict[str, list[str]] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table, normalizing TIMESTAMP(NANOS)
    columns (unsupported by Spark's vectorized parquet reader) to
    microsecond TimestampType by truncation — bit-identical to DuckDB's
    own nanos->micros read-time truncation, so oracle comparisons on
    raw timestamp values are exact."""
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # The driver test tables are single-file/single-row-group parquet —
    # unsplittable, so every scan would run as ONE task regardless of
    # cores. Repartition non-trivial tables to the session parallelism
    # (a few-MB shuffle locally). On a real deployment the data is many
    # files/row groups, natural splits >= cores, and this stays inert —
    # it only compensates for the local fixture shape, it is not how
    # the engine achieves parallelism at scale.
    try:
        size = os.path.getsize(path) if os.path.isfile(path) else 0
    except OSError:
        size = 0
    if size > 256 * 1024:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    names: tuple[str, ...] = TABLE_NAMES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver parquet tables and (optionally) register each as
    a temp view so both the DataFrame and ``spark.sql`` front-ends see
    them — the Spark analog of the reference's catalog registration via
    ``CREATE TABLE`` DDL + ``create_temporary_view``
    (reference flink/tumbling_window.py:228-236,281)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
