"""CC propagation-round exchange probe (r15; VERDICT r14 item 6).

At cluster scale (labels too big to broadcast) every connected-
components round is a sort-merge join of the cached symmetrized edge
list `sym` (repartitioned on the probe key "b" under the persist —
r14, operators/graph.py:69) against the previous round's labels.
This probe forces the SMJ path (autoBroadcastJoinThreshold=-1) and
prints the round plan so the exchange placement is inspectable:

- PASS condition (the r14 edge-cache fix): no Exchange between the
  InMemoryTableScan of `sym` and the join — the cache's partitioning
  satisfies the join's clustering, so the per-round edge re-exchange
  is gone.
- Also reports whether the LABELS side re-exchanges per round (the
  r15 question): labels come out of the previous round checkpointed
  after a "node"-keyed join/aggregate, so their partitioning may
  already satisfy the rename-to-"b" join key.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from m5_competition_kaggle_spark.session import get_spark

    spark = get_spark(
        "cc-labels-probe",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    n_part = spark.sparkContext.defaultParallelism
    edges = spark.range(10_000).select(
        F.col("id").alias("a"), ((F.col("id") * 7 + 1) % 9973).alias("b")
    )
    sym = (
        edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .repartition(n_part, "b")
        .persist()
    )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
        .localCheckpoint(eager=False)
    )
    labels.agg(F.sum("comp")).collect()  # materialize cache + checkpoint

    nbr_min = (
        sym.join(
            labels.select(
                F.col("node").alias("b"), F.col("comp").alias("nbr_comp")
            ),
            "b",
        )
        .groupBy("a")
        .agg(F.min("nbr_comp").alias("min_nbr"))
    )
    round_df = labels.join(
        nbr_min.select(F.col("a").alias("node"), "min_nbr"), "node", "left"
    ).select(
        "node",
        F.least(F.col("comp"), F.coalesce("min_nbr", "comp")).alias("comp"),
    )
    plan = round_df._sc._jvm.PythonSQLUtils.explainString(
        round_df._jdf.queryExecution(), "formatted"
    )
    print(plan)
    n_exch = len(re.findall(r"\bExchange\b", plan))
    in_mem = "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    smj = "SortMergeJoin" in plan
    print(
        f"SUMMARY: exchanges={n_exch} smj={smj} cached_edges_visible={in_mem}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
