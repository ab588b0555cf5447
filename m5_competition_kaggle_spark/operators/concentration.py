"""Composition concentration — per-unit Herfindahl index.

The mix auditor for packed training shards (x26/x29) and any other
grouped composition: a shard whose documents all come from one source
trains differently than a well-mixed one, even when the char budgets
match (x119 plans the global mix; this certifies what each unit
actually got). The Herfindahl-Hirschman index

    HHI = Σ_classes (n_class / n)²     (1/|classes| .. 1)

is published as the exact integer permille (1000·Σn_c²) DIV n², plus
the dominant class and its share — all integer arithmetic.

Scale design: two keyed aggregations (unit×class, then unit) and one
per-unit window for the argmax — no global shuffle, no windows wider
than a unit's class list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_hhi(
    df: DataFrame, unit_col: str, class_col: str
) -> DataFrame:
    """Per-``unit_col`` concentration over ``class_col``.

    Output: unit, n (rows), n_classes, hhi_permille, dom_class (ties
    broken on class ascending), dom_permille."""
    cells = df.groupBy(unit_col, class_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy(unit_col).orderBy(
        F.col("__c").desc(), F.col(class_col).asc()
    )
    ranked = cells.withColumn(
        "__rn", F.row_number().over(w)
    )
    agg = ranked.groupBy(unit_col).agg(
        F.sum("__c").alias("n"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.col("__c") * F.col("__c")).alias("__ss"),
        F.max(
            F.when(F.col("__rn") == 1, F.col(class_col))
        ).alias("dom_class"),
        F.max(
            F.when(F.col("__rn") == 1, F.col("__c"))
        ).alias("__dom_c"),
    )
    return agg.select(
        unit_col,
        "n",
        "n_classes",
        F.expr("(1000 * __ss) DIV (n * n)").alias("hhi_permille"),
        "dom_class",
        F.expr("(1000 * __dom_c) DIV n").alias("dom_permille"),
    )
