"""In-engine PCA: dominant eigenvector by power iteration.

Computes the top principal component of the embedding covariance
matrix entirely inside the engine — covariance entries come from the
same exact-DECIMAL construction as ``embedding_covariance_upper``
(rp.py), and the power iteration v <- C v / ||C v|| runs a FIXED
budget of iterations with the house iterative-operator discipline
(pagerank / Lloyd / GD-classifier): per-term 12-dp rounding into
exact DECIMAL sums so every iterate is bit-identical on both engines
regardless of partitioning, lineage truncated every 4th iteration with
an eager localCheckpoint (the grid re-quantization makes cadence
value-neutral — A/B'd), and a recursive-CTE oracle generated from the
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
    "computed entirely in-engine. Covariance entries are the same "
    "exact-DECIMAL sums as embedding_covariance_upper (symmetrized) "
    "but produced join-free: the upper-triangle outer product is "
    "emitted row-wise from a let-bound quantized array and map-side "
    "combined, so only d(d+1)/2 partial sums per partition ever "
    "shuffle; each matvec term and each squared-norm term is "
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
    # Upper-triangle outer product emitted ROW-WISE: the quantized
    # vector is let-bound once per row (single-element-array transform
    # — Catalyst has no let, but a lambda variable is evaluated once,
    # dodging the project-collapse re-evaluation trap), then the
    # d(d+1)/2 products explode and aggregate with map-side combine.
    # This replaces the round-trip of a posexplode self-join on vec_id
    # (2 shuffles of n*d rows + an n*d^2-row join) with zero joins:
    # each partition ships at most d(d+1)/2 partial DECIMAL sums.
    q = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double"), 6).cast("decimal(18,6)"),
    )
    pairs = F.flatten(
        F.transform(
            F.array(q),
            lambda qq: F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(DIM)),
                    lambda i: F.transform(
                        F.sequence(i, F.lit(DIM)),
                        lambda j: F.struct(
                            i.alias("i"),
                            j.alias("j"),
                            (
                                F.element_at(qq, i.cast("int"))
                                * F.element_at(qq, j.cast("int"))
                            ).alias("prod"),
                        ),
                    ),
                )
            ),
        )
    )
    p = (
        emb.select(F.explode(pairs).alias("pr"))
        .select(
            F.col("pr.i").alias("i"),
            F.col("pr.j").alias("j"),
            F.col("pr.prod").alias("prod"),
        )
        .groupBy("i", "j")
        .agg(F.sum("prod").alias("sij"), F.count(F.lit(1)).alias("n"))
    )
    s = (
        emb.select(F.posexplode(q).alias("i0", "qv"))
        .select((F.col("i0") + 1).alias("i"), "qv")
        .groupBy("i")
        .agg(F.sum("qv").alias("si"))
    )
    sa = s.select("i", F.col("si").alias("sia"))
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
    # cov is d^2 cells REGARDLESS of corpus size — coalesce(1) makes
    # every iteration's matvec a single tiny task instead of 32
    # near-empty ones (measured ~500 -> ~200 ms/iteration locally; on
    # a cluster the iteration path is driver-adjacent constant-size
    # work either way, the corpus-scaling stage is the scan above).
    cov = tracked_persist(
        covu.unionAll(
            covu.filter(F.col("i") < F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "c"
            )
        ).coalesce(1)
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
    # Lineage is truncated every 4th iteration, not every iteration:
    # the iterate is re-quantized to the DECIMAL(20,12) grid each step,
    # so checkpoint cadence cannot change the values (A/B'd k=1/3/4/6
    # at sf0.1: bit-identical outputs; k=4 drops 9 of 12 eager
    # checkpoint sub-jobs). Within a 4-chain each matvec's broadcast
    # re-runs <=3 prior tiny iterations over the persisted cov —
    # bounded, measured cheaper than the jobs it replaces.
    for it in range(PI_ITERS):
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
        )
        if (it + 1) % 4 == 0:
            v = v.localCheckpoint(eager=True)
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
