"""In-engine PCA: dominant eigenvector by power iteration.

Computes the top principal component of the embedding covariance
matrix entirely inside the engine — covariance entries come from the
same exact-DECIMAL construction as ``embedding_covariance_upper``
(rp.py), and the power iteration v <- C v / ||C v|| runs a FIXED
budget of iterations with the house iterative-operator discipline
(pagerank / Lloyd / GD-classifier): per-term 12-dp rounding into
exact DECIMAL sums so every iterate is bit-identical on both engines
regardless of partitioning, lineage truncated per iteration with an
eager localCheckpoint, and a recursive-CTE oracle generated from the
same constants.

Public sources: von Mises & Pollaczek-Geiringer (1929) power
iteration; Halko, Martinsson & Tropp, SIAM Rev. 53 (2011) for the
randomized-sketch scale path noted in the doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.caching import tracked_persist
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

DIM = 64
PI_ITERS = 12  #: fixed power-iteration budget (deterministic output)
PI_V0 = 0.125  #: uniform start 1/sqrt(DIM) — exact in binary


#: shared covariance CTEs (both triangles) — the
#: embedding_covariance_upper construction, symmetrized.
_COV_SQL = f"""
    base AS (
        SELECT vec_id, i,
               CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                    AS DECIMAL(18,6)) AS q
        FROM embeddings, generate_series(1, {DIM}) AS t(i)),
    s AS (SELECT i, sum(q) AS si, count(*) AS n FROM base GROUP BY i),
    p AS (SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS sij
          FROM base a JOIN base b
            ON a.vec_id = b.vec_id AND b.i >= a.i
          GROUP BY 1, 2),
    covu AS (
        SELECT p.i, p.j,
               ROUND((sa.n * CAST(p.sij AS DOUBLE)
                      - CAST(sa.si AS DOUBLE) * CAST(sb.si AS DOUBLE))
                     / sa.n / (sa.n - 1), 6) + 0.0 AS c
        FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j),
    cov AS (
        SELECT i, j, c FROM covu
        UNION ALL
        SELECT j, i, c FROM covu WHERE i < j)"""


@register(
    "power_iteration_top_pc",
    oracle=f"""
    WITH RECURSIVE {_COV_SQL},
    rec AS (
        SELECT 0 AS it, i, CAST({PI_V0} AS DECIMAL(20,12)) AS v
        FROM generate_series(1, {DIM}) t(i)
        UNION ALL
        SELECT it, i,
               CAST(ROUND(ud / sqrt(CAST(n2 AS DOUBLE)), 12)
                    AS DECIMAL(20,12)) AS v
        FROM (
            SELECT it, i, ud,
                   SUM(CAST(ROUND(ud * ud, 12) AS DECIMAL(28,12)))
                       OVER (PARTITION BY it) AS n2
            FROM (
                SELECT r.it + 1 AS it, c.i AS i,
                       CAST(SUM(CAST(ROUND(c.c * CAST(r.v AS DOUBLE), 12)
                                     AS DECIMAL(28,12))) AS DOUBLE) AS ud
                FROM cov c JOIN rec r ON r.i = c.j
                WHERE r.it < {PI_ITERS}
                GROUP BY 1, 2))),
    vf AS (SELECT i, v FROM rec WHERE it = {PI_ITERS}),
    uf AS (
        SELECT c.i,
               CAST(SUM(CAST(ROUND(c.c * CAST(r.v AS DOUBLE), 12)
                             AS DECIMAL(28,12))) AS DOUBLE) AS ud
        FROM cov c JOIN vf r ON r.i = c.j
        GROUP BY 1),
    ray AS (
        SELECT CAST(SUM(CAST(ROUND(CAST(vf.v AS DOUBLE) * uf.ud, 12)
                             AS DECIMAL(28,12))) AS DOUBLE) AS lam
        FROM vf JOIN uf ON uf.i = vf.i)
    SELECT CAST(vf.i AS INT) AS i,
           CAST(ROUND(CAST(vf.v AS DOUBLE), 6) AS DOUBLE) + 0.0
               AS loading,
           CAST(ROUND(ray.lam, 6) AS DOUBLE) + 0.0 AS eigval_est
    FROM vf, ray
    """,
    doc=f"Top principal component of the embedding covariance by "
    f"{PI_ITERS} power iterations (von Mises 1929) — the whitening / "
    "OPQ-rotation direction feeding the PQ/SQ compression ladder, "
    "computed entirely in-engine. Covariance entries reuse the "
    "embedding_covariance_upper exact-DECIMAL construction "
    "(symmetrized); each matvec term and each squared-norm term is "
    "rounded to 12 dp and summed in exact DECIMAL, the iterate is "
    "re-quantized to a DECIMAL(20,12) grid, so all "
    f"{PI_ITERS} iterations are bit-identical on both engines (the "
    "pagerank/Lloyd state-rounding discipline); eigenvalue estimate "
    "is the final Rayleigh quotient v'Cv (v normalized). Start "
    f"vector is uniform 1/sqrt({DIM}) = {PI_V0} (exact in binary); "
    "output sign is therefore pinned. Fixed budget, not "
    "convergence-tested: the spec is 'the iterate after "
    f"{PI_ITERS} steps', exact on both engines either way. Scale: "
    "the corpus is touched ONCE (covariance partial sums shuffle "
    "d(d+1)/2 cells per partition, never rows); each iteration is a "
    f"{DIM}x{DIM} join — driver-free, constant-size. At 10^12 rows "
    "swap exact covariance for a Halko-Martinsson-Tropp randomized "
    "sketch; the iteration path is unchanged.",
)
def power_iteration_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double"), 6).cast("decimal(18,6)"),
            )
        ).alias("i0", "q"),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "q")
    s = base.groupBy("i").agg(
        F.sum("q").alias("si"), F.count(F.lit(1)).alias("n")
    )
    a = base.select("vec_id", "i", F.col("q").alias("qa"))
    b = base.select("vec_id", F.col("i").alias("j"), F.col("q").alias("qb"))
    p = (
        a.join(b, "vec_id")
        .filter(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("sij"))
    )
    sa = s.select("i", F.col("si").alias("sia"), "n")
    sb = s.select(F.col("i").alias("j"), F.col("si").alias("sib"))
    covu = (
        p.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .select(
            "i",
            "j",
            (
                F.round(
                    (
                        F.col("n") * F.col("sij").cast("double")
                        - F.col("sia").cast("double")
                        * F.col("sib").cast("double")
                    )
                    / F.col("n")
                    / (F.col("n") - 1),
                    6,
                )
                + F.lit(0.0)
            ).alias("c"),
        )
    )
    cov = tracked_persist(
        covu.unionAll(
            covu.filter(F.col("i") < F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "c"
            )
        )
    )

    def matvec(v: DataFrame) -> DataFrame:
        """u = C v with per-term 12-dp rounding into exact DECIMAL."""
        vr = v.select(F.col("i").alias("j"), F.col("v"))
        return (
            cov.join(F.broadcast(vr), "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.round(
                        F.col("c") * F.col("v").cast("double"), 12
                    ).cast("decimal(28,12)")
                )
                .cast("double")
                .alias("ud")
            )
        )

    v = spark.range(1, DIM + 1).select(
        F.col("id").alias("i"),
        F.lit(PI_V0).cast("decimal(20,12)").alias("v"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    for _ in range(PI_ITERS):
        u = matvec(v)
        n2 = (
            F.sum(
                F.round(F.col("ud") * F.col("ud"), 12).cast(
                    "decimal(28,12)"
                )
            )
            .over(wall)
            .cast("double")
        )
        v = u.select(
            "i",
            F.round(F.col("ud") / F.sqrt(n2), 12)
            .cast("decimal(20,12)")
            .alias("v"),
        ).localCheckpoint(eager=True)
    uf = matvec(v)
    ray = (
        v.join(uf, "i")
        .agg(
            F.sum(
                F.round(F.col("v").cast("double") * F.col("ud"), 12).cast(
                    "decimal(28,12)"
                )
            )
            .cast("double")
            .alias("lam")
        )
    )
    return v.crossJoin(F.broadcast(ray)).select(
        F.col("i").cast("int").alias("i"),
        (
            F.round(F.col("v").cast("double"), 6).cast("double")
            + F.lit(0.0)
        ).alias("loading"),
        (F.round(F.col("lam"), 6).cast("double") + F.lit(0.0)).alias(
            "eigval_est"
        ),
    )
