"""Source factories — the engine's connector layer.

The reference binds its dynamic table to a Kinesis stream connector
with JSON format (flink/tumbling_window.py:96-138). This engine keeps
the same *semantics* behind a config-selected factory:

- ``kinesis``  — production path (requires the spark-kinesis connector
  jar on the cluster; options passed through). Not available in the
  local test container — construction is attempted lazily so the rest
  of the engine stays testable, mirroring the reference's own
  print-vs-kinesis swap (README.md:93).
- ``kafka``    — equivalent production path for Kafka-compatible buses.
- ``file-json`` / ``file-parquet`` — replayable local streams (each
  file = one micro-batch with ``maxFilesPerTrigger=1``): the test and
  bench path.
- ``socket``   — dev feed (nc) like Flink's socket examples.
- ``rate``     — synthetic load generator, used to emulate the
  reference's producer (datagen/stock.py) fully inside Spark.

JSON semantics preserved from the reference (SURVEY.md §2 S2/P4):
- the producer emits MORE fields than the table declares
  (datagen/stock.py:24-33 emits 8, the DDL declares 3,
  flink/tumbling_window.py:116-118) — undeclared fields are silently
  pruned, malformed documents yield NULLs rather than failures;
- timestamps accept both the 'SQL' (``2024-01-01 00:00:07``) and
  'ISO-8601' (``2024-01-01T00:00:07``) standards
  (flink/tumbling_window.py:104-113,130) — normalized by a single
  string->timestamp cast that handles both.

Scale: at 100 TB-equivalent stream rates the source parallelism is
the shard/partition count; all parsing here is JVM-side
(``from_json``), no Python in the per-record path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The reference's declared input table schema
#: (flink/tumbling_window.py:116-118): ticker VARCHAR(6), price DOUBLE,
#: utc TIMESTAMP(3). ``utc`` is declared STRING here and cast after
#: JSON parsing so both timestamp standards are accepted.
STOCK_JSON_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("utc", T.StringType()),
    ]
)

STOCK_TICKERS = ("AAPL", "AMZN", "MSFT", "TSLA")  # datagen/stock.py:28


def parse_stock_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON payload -> typed (ticker, price, utc) rows.

    Spark analog of the reference's ``'format' = 'json'`` +
    ``'json.timestamp-format.standard'`` (flink/tumbling_window.py:
    129-130): undeclared fields dropped, both timestamp standards
    accepted, VARCHAR(6) width enforced by substring at ingest."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), STOCK_JSON_SCHEMA).alias("r")
    )
    return parsed.select(
        F.substring(F.col("r.ticker"), 1, 6).alias("ticker"),
        F.col("r.price").alias("price"),
        # cast accepts '2024-01-01 00:00:07[.f]' (SQL) and
        # '2024-01-01T00:00:07[.f]' (ISO-8601)
        F.col("r.utc").cast("timestamp").alias("utc"),
    )


def create_stream_source(
    spark: SparkSession,
    kind: str,
    path: str | None = None,
    options: dict[str, str] | None = None,
    rows_per_second: int = 100,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Build the streaming input table (reference CREATE TABLE ...
    WITH ('connector'=..., ...), flink/tumbling_window.py:96-138)."""
    options = dict(options or {})
    if kind == "file-json":
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .load(path)
        )
        return parse_stock_json(raw, "value")
    if kind == "file-parquet":
        # Typed replay of a parquet directory (tests/bench: the events
        # table re-fed as a stream). Schema must be supplied for
        # streaming reads; take it from a batch peek (footer only).
        # TIMESTAMP(NANOS) columns get the same truncation-to-micros
        # normalization as session.read_table.
        from kinesis_analytics_demo_spark.session import _nanos_timestamp_cols

        nanos_cols = _nanos_timestamp_cols(path)
        if nanos_cols:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = spark.read.parquet(path).schema
        df = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(path)
        )
        for c in nanos_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df
    if kind == "socket":
        raw = (
            spark.readStream.format("socket")
            .option("host", options.pop("host", "localhost"))
            .option("port", options.pop("port", "9999"))
            .load()
        )
        return parse_stock_json(raw, "value")
    if kind == "rate":
        # Fully-internal stand-in for the reference's producer loop
        # (datagen/stock.py:36-50): random ticker from the fixed set,
        # price in [0,100) rounded to cents, current event time.
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second))
            .load()
        )
        n = len(STOCK_TICKERS)
        ticker = F.array(*[F.lit(t) for t in STOCK_TICKERS]).getItem(
            F.pmod(F.xxhash64("value"), F.lit(n)).cast("int")
        )
        price = F.round(F.pmod(F.xxhash64("value", F.lit(1)), F.lit(10000)) / 100.0, 2)
        return raw.select(
            ticker.alias("ticker"), price.alias("price"), F.col("timestamp").alias("utc")
        )
    if kind in ("kinesis", "kafka"):
        # Production connectors: pass options straight through, parse
        # the value payload with the same JSON semantics. Requires the
        # connector package on the cluster (not bundled in OSS
        # pyspark) — mirrors the reference's jar injection
        # (flink/tumbling_window.py:68-77).
        reader = spark.readStream.format(kind)
        for k, v in options.items():
            reader = reader.option(k, v)
        raw = reader.load()
        value_col = "data" if kind == "kinesis" else "value"
        return parse_stock_json(raw, value_col)
    raise ValueError(f"unknown source kind: {kind!r}")
