"""Round-8 queue, sixth batch — distributed linear algebra.

- x130 integer power-iteration PCA (``operators/pca_power.py``): the
  dominant principal direction of the embedding corpus from the exact
  int64 Gram matrix, three integer matvec+rescale rounds — iterative
  numerical linear algebra with a bit-exact unrolled SQL twin (the
  x41/x65 fixed-round precedent applied to eigenvectors). Shuffle
  volume is d² per partition for the Gram stage and O(d²) per round
  after, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from m5_competition_kaggle_spark.operators.pca_power import (
    gram_matrix,
    power_iteration,
)
from m5_competition_kaggle_spark.sources.catalog import load_table


def x130_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the quantized embedding corpus:
    exact Gram, 3 integer power rounds, per-dimension permille
    loading."""
    emb = load_table(spark, sf_dir, "embeddings")
    gram = gram_matrix(emb, "embedding")
    return power_iteration(gram, rounds=3).orderBy("i")


QUERIES = {"x130_pca_power": x130_pca_power}

ORACLES: dict[str, str] = {}

ORACLES["x130_pca_power"] = """
WITH qv AS (
    SELECT list_transform(
               embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
           ) AS q
    FROM embeddings
),
cells AS MATERIALIZED (
    SELECT ia - 1 AS i, ja - 1 AS j,
           CAST(sum(q[ia] * q[ja]) AS BIGINT) AS g
    FROM qv,
         unnest(generate_series(1, len(q))) AS t1(ia),
         unnest(generate_series(1, len(q))) AS t2(ja)
    GROUP BY ia, ja
),
r1 AS MATERIALIZED (
    SELECT i, CAST(sum(g) AS BIGINT) AS v FROM cells GROUP BY i
),
m1 AS (SELECT max(abs(v)) AS m FROM r1),
n1 AS MATERIALIZED (
    SELECT i AS j, v // (m // 1000 + 1) AS v FROM r1, m1
),
r2 AS MATERIALIZED (
    SELECT c.i, CAST(sum(c.g * n.v) AS BIGINT) AS v
    FROM cells c JOIN n1 n ON c.j = n.j GROUP BY c.i
),
m2 AS (SELECT max(abs(v)) AS m FROM r2),
n2 AS MATERIALIZED (
    SELECT i AS j, v // (m // 1000 + 1) AS v FROM r2, m2
),
r3 AS MATERIALIZED (
    SELECT c.i, CAST(sum(c.g * n.v) AS BIGINT) AS v
    FROM cells c JOIN n2 n ON c.j = n.j GROUP BY c.i
),
m3 AS (SELECT max(abs(v)) AS m FROM r3)
SELECT i, v AS v_raw,
       CASE WHEN m > 0 THEN (1000 * v) // m END AS v_permille
FROM r3, m3
ORDER BY i
"""
