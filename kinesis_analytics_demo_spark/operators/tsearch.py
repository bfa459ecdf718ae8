"""Time-series similarity search — find entities whose activity
PROFILE looks like the query's (EDBT 2019's streaming-systems
time-series search problem, batch form): per-user daily value
series over the month, z-normalized, ranked by Euclidean distance.

Pipeline shape:
1. resample each user's events to the fixed daily grid (decimal
   sums; missing days are exact zeros) — one aggregate;
2. assemble the 30-bucket profile vector per user via a day->sum
   map read back along the fixed grid (bounded by the grid width,
   never by event count);
3. z-normalize from decimal sufficient statistics (mean/std are
   closed forms of exact sums — the stats-battery discipline);
4. brute-force distances query-vs-corpus with the broadcast query
   side (the similarity-family shape); at 100 TB the same profile
   vectors feed the LSH/IVF/RP candidate generators unchanged —
   a profile IS an embedding once built.

Determinism: grid sums in DECIMAL; normalization and distance are
fixed chains of double ops folding left-to-right over the day index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

N_DAYS = 30
N_QUERY_USERS = 5
TOP_K = 5


@register(
    "timeseries_similarity_topk",
    oracle=f"""
    WITH g AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT)
                 - (SELECT CAST(floor(epoch(min(ts)) / 86400) AS BIGINT)
                    FROM events) AS day,
               CAST(value AS DECIMAL(18,6)) AS v
        FROM events),
    d AS (SELECT user_id, day, CAST(SUM(v) AS DOUBLE) AS s
          FROM g WHERE day >= 0 AND day < {N_DAYS}
          GROUP BY user_id, day),
    grid AS (
        SELECT u.user_id, t.day, COALESCE(d.s, 0.0) AS s
        FROM (SELECT DISTINCT user_id FROM d) u
        CROSS JOIN (SELECT unnest(generate_series(0, {N_DAYS - 1}))
                    AS day) t
        LEFT JOIN d ON d.user_id = u.user_id AND d.day = t.day),
    prof AS (
        SELECT user_id, list(s ORDER BY day) AS p
        FROM grid GROUP BY user_id),
    norm AS (
        SELECT user_id,
               list_sum(p) / {N_DAYS} AS mu,
               sqrt(list_sum([x * x for x in p]) / {N_DAYS}
                    - (list_sum(p) / {N_DAYS})
                      * (list_sum(p) / {N_DAYS})) AS sd,
               p
        FROM prof),
    z AS (
        SELECT user_id,
               [CASE WHEN sd = 0 THEN 0.0 ELSE (p[i] - mu) / sd END
                for i in generate_series(1, {N_DAYS})] AS zp
        FROM norm),
    q AS (SELECT user_id AS query_user, zp AS qp FROM z
          WHERE user_id < {N_QUERY_USERS}),
    dist AS (
        SELECT q.query_user, z.user_id AS neighbor_user,
               ROUND(sqrt(list_sum([(z.zp[i] - q.qp[i])
                                    * (z.zp[i] - q.qp[i])
                                    for i in generate_series(1, {N_DAYS})])),
                     6) AS distance
        FROM z, q WHERE z.user_id != q.query_user),
    ranked AS (
        SELECT query_user, neighbor_user, distance,
               row_number() OVER (PARTITION BY query_user
                                  ORDER BY distance, neighbor_user)
                   AS rank
        FROM dist)
    SELECT query_user, neighbor_user, distance, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="Time-series similarity search: per-user daily activity "
    f"profiles over the {N_DAYS}-day span (decimal grid sums, exact "
    "zero fill), z-normalized from decimal sufficient statistics, "
    "then exact Euclidean top-5 per query user with the broadcast "
    "query side. Once built, a profile IS an embedding — the same "
    "vectors feed the LSH/IVF/RP candidate generators at scale.",
)
def timeseries_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    base = ev.agg(
        F.floor(F.min(sec) / 86400).cast("bigint").alias("d0")
    )
    g = ev.crossJoin(F.broadcast(base)).select(
        "user_id",
        (F.floor(sec / 86400).cast("bigint") - F.col("d0")).alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    d = (
        g.filter((F.col("day") >= 0) & (F.col("day") < N_DAYS))
        .groupBy("user_id", "day")
        .agg(F.sum("v").cast("double").alias("s"))
    )
    # dense 30-bucket profile: day->sum map per user, read back along
    # the fixed grid with exact zero fill for missing days
    prof = d.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("day"), F.col("s"))))
        ).alias("m")
    ).select(
        "user_id",
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), F.lit(N_DAYS - 1).cast("bigint")),
            lambda day: F.coalesce(F.element_at("m", day), F.lit(0.0)),
        ).alias("p"),
    )
    mu = F.aggregate("p", F.lit(0.0), lambda a, x: a + x) / N_DAYS
    sumsq = F.aggregate("p", F.lit(0.0), lambda a, x: a + x * x)
    sd = F.sqrt(sumsq / N_DAYS - mu * mu)
    withstats = prof.select("user_id", "p", mu.alias("mu"), sd.alias("sd"))
    z = withstats.select(
        "user_id",
        F.transform(
            "p",
            lambda x: F.when(F.col("sd") == 0, F.lit(0.0)).otherwise(
                (x - F.col("mu")) / F.col("sd")
            ),
        ).alias("zp"),
    )
    q = z.filter(F.col("user_id") < N_QUERY_USERS).select(
        F.col("user_id").alias("query_user"), F.col("zp").alias("qp")
    )
    dist = (
        z.crossJoin(F.broadcast(q))
        .filter(F.col("user_id") != F.col("query_user"))
        .select(
            "query_user",
            F.col("user_id").alias("neighbor_user"),
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.zip_with("zp", "qp", lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                ),
                6,
            ).alias("distance"),
        )
    )
    w = Window.partitionBy("query_user").orderBy(
        F.asc("distance"), F.asc("neighbor_user")
    )
    return (
        dist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_user", "neighbor_user", "distance",
            F.col("rank").cast("int"),
        )
    )
