"""Similarity search over embedding columns — brute-force cosine top-k
(the exact baseline) and hyperplane-LSH bucketed ANN (the scale path).

Scale design: brute force is O(Q·N) — fine when Q (queries) is small
and broadcastable; the LSH variant buckets candidates by sign-pattern so
the join fans each query to ~N/2^bits candidates.  All dot products are
JVM-side higher-order array expressions (zip_with + aggregate); no
Python workers in either path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_M31 = 2_147_483_647


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id.

    The query side is a broadcast self-subset — the join is
    broadcast-hash, never a shuffle of the big side.  Ranking rounds the
    cosine to 9 dp before ordering so ranks are stable across engines
    and summation orders; ties break on candidate id.
    """
    base = vectors.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("vec")
    )
    queries = base.where(F.col("cand_id").isin(query_ids)).select(
        F.col("cand_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("vec")), 9))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos", "rk")
        .orderBy("query_id", "rk")
    )


def _hyperplane_expr(vec_col: str, n_bits: int) -> str:
    """SQL higher-order expression: sign pattern of projections onto
    pseudo-random hyperplanes whose components derive from
    xxhash64(bit:dim) mapped into [-1, 1] — deterministic, no driver
    RNG, no Python.  (SQL form because shiftleft's Python binding only
    takes static ints, and the shift amount here is the lambda-bound
    bit index.)"""
    return f"""
aggregate(
  transform(sequence(0, {n_bits - 1}), b ->
    if(aggregate(
         zip_with({vec_col}, sequence(0, size({vec_col}) - 1), (x, d) ->
           x * (cast(pmod(xxhash64(concat(cast(b as string), ':',
                                          cast(d as string))), 2001) - 1000
                     as double) / 1000.0)),
         cast(0.0 as double), (acc, v) -> acc + v) > 0,
       shiftleft(cast(1 as bigint), b), cast(0 as bigint))),
  cast(0 as bigint), (acc, x) -> acc + x)
"""


def lsh_ann_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share the query's LSH bucket (equi-join on
    signature), then exact cosine rank within the bucket."""
    base = vectors.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("sig", F.expr(_hyperplane_expr("vec", n_bits)))
    queries = base.where(F.col("cand_id").isin(query_ids)).select(
        F.col("cand_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("sig").alias("qsig"),
    )
    scored = (
        base.join(F.broadcast(queries), F.col("sig") == F.col("qsig"))
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("vec")), 9))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos", "rk")
        .orderBy("query_id", "rk")
    )


def neardup_pairs_blas(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via Arrow + numpy matmul.

    The BLAS-backed bulk kernel: the comparison side is collected,
    L2-normalized and broadcast; each Arrow batch of rows does one
    matrix multiply against it.  Interpreted higher-order-function
    expressions cost ~ms per pair; this is the per-bucket kernel an
    IVF/LSH partitioning calls at 10^9-vector scale (the broadcast side
    is then one bucket, never the full corpus).  ``neardup_pairs_cosine``
    remains the expression-only, oracle-exact form.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    rows = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).collect()
    import numpy as np

    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    V = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    norms = np.where(norms > 0, norms, 1.0)
    Vn = V / norms[:, None]
    spark = vectors.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_vn = spark.sparkContext.broadcast(Vn)

    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def blocks(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        cand_ids, cand_vn = b_ids.value, b_vn.value
        for pdf in it:
            rid = pdf["id"].to_numpy(dtype=_np.int64)
            R = _np.array([list(v) for v in pdf["v"]], dtype=_np.float64)
            rn = _np.linalg.norm(R, axis=1)
            rn = _np.where(rn > 0, rn, 1.0)
            sims = (R / rn[:, None]) @ cand_vn.T
            ia, ib = _np.nonzero(sims >= threshold)
            mask = rid[ia] < cand_ids[ib]  # id_a < id_b, no self pairs
            yield pd.DataFrame(
                {
                    "id_a": rid[ia][mask],
                    "id_b": cand_ids[ib][mask],
                    "cos": _np.round(sims[ia, ib][mask], 9),
                }
            )

    return (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .mapInPandas(blocks, schema)
        .orderBy("id_a", "id_b")
    )


def neardup_pairs_cosine(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= θ).

    Brute-force O(n^2) verification form; the discovery path at scale is
    ``lsh_ann_topk``'s bucketing.  Cosine rounded to 9 dp for stability.
    """
    base = vectors.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cos", F.round(cosine(F.col("a.vec"), F.col("b.vec")), 9))
        .where(F.col("cos") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos")
        .orderBy("id_a", "id_b")
    )
