"""Product-quantization distortion audit — per-subspace encoding
error of the x72 PQ construction (``operators/similarity_pq.py``).

PQ replaces each dim/m sub-vector by its nearest codebook entry; ADC
distance estimates are then sums of per-subspace table lookups, so
the ESTIMATION error an index user eats is exactly the per-subspace
quantization error this operator certifies: total / mean / max exact
int64 squared L2 between every sub-vector and its assigned code. A
subspace whose mean error dwarfs the others needs more codes (or a
coordinate rotation) before its ADC estimates are trustworthy —
the compression-side sibling of x137's IVF occupancy health audit.

Same determinism contract as similarity_pq: 1e-3 quantized
components (``similarity.QUANT``), exact int64 distances, (distance,
cid) argmin ties, the k-lowest-id seed codebook. Scale: encode is one
map-side pass against the broadcast codebook (m×k tiny rows); the
audit is a keyed aggregation to m rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.similarity import (
    quantize_expr,
)
from m5_competition_kaggle_spark.operators.similarity_pq import (
    _sub_l2,
)


def pq_distortion(
    vectors: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-subspace distortion of the PQ encoding: (s, n_vectors,
    total_err, mean_err, max_err), one row per subspace 0..m−1.
    ``dim`` must divide by ``m``."""
    sub = dim // m
    if sub * m != dim:
        raise ValueError("m must divide dim")
    qz = vectors.select(
        F.col(id_col).alias("__id"), quantize_expr(vec_col).alias("__v")
    )

    def subspaces(df: DataFrame) -> DataFrame:
        return df.select(
            "__id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).cast("long").alias("s"),
                            F.expr(
                                f"slice(__v, {s * sub + 1}, {sub})"
                            ).alias("sv"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("__e"),
        ).select("__id", "__e.s", "__e.sv")

    corp = subspaces(qz)
    cents = (
        subspaces(qz.filter(F.col("__id") < n_codes))
        .select(F.col("__id").alias("cid"), "s",
                F.col("sv").alias("cv"))
    )
    w_enc = Window.partitionBy("__id", "s").orderBy("__d", "cid")
    best = (
        corp.join(F.broadcast(cents), "s")
        .withColumn("__d", _sub_l2("sv", "cv"))
        .withColumn("__rn", F.row_number().over(w_enc))
        .filter(F.col("__rn") == 1)
        .select("s", "__d")
    )
    return (
        best.groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("__d").cast("long").alias("total_err"),
            F.max("__d").cast("long").alias("max_err"),
        )
        .select(
            "s",
            "n_vectors",
            "total_err",
            F.expr("total_err DIV n_vectors").alias("mean_err"),
            "max_err",
        )
    )
