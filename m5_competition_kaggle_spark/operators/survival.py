"""Kaplan-Meier product-limit survival estimator, right-censored.

The lifetime readout for retention/durability questions ("how long does
a user stay active", "how long until a doc is superseded") under the
censoring every live dataset has: entities still active at the
observation edge contribute risk time but no death. At each distinct
observed death time t with d_t deaths out of n_t at risk,

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

Determinism: d_i and n_i are EXACT int64 counts (the certificate's
anchor); the survival curve is published as round(1e6 * exp(sum of
ln((n-d)/n)))  — the x32/x63 log precedent: both engines evaluate the
identical per-row ln of the identical IEEE quotient, and ppm rounding
absorbs the sub-ulp accumulation-order differences of the windowed sum.

Scale design: the corpus reduces FIRST to one (t, deaths, total) row
per distinct observed time via keyed aggregation — the survival table
the windows then walk is bounded by |distinct durations| (the
observation window length in days), NOT corpus size, so its global
window is a justified bounded single-partition exchange (the q15 code-
table precedent; declared in scripts/plan_audit.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def km_curve(
    durations: DataFrame,
    t_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan-Meier curve from one row per subject: integer observed
    time ``t_col`` and ``event_col`` 1 = death observed, 0 = censored
    at that time.

    Output one row per distinct time with at least one death: t,
    n_risk (subjects with observed time >= t: deaths and censorings at
    t are both still at risk at t), d (deaths at t), surv_ppm
    (parts-per-million cumulative survival). Censoring-only times
    shape n_risk but emit no row, per the product-limit definition.
    """
    cells = durations.groupBy(F.col(t_col).alias("t")).agg(
        F.sum(F.col(event_col)).cast("long").alias("d"),
        F.count(F.lit(1)).alias("c_all"),
    )
    w_ord = Window.orderBy("t")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    n_total = cells.agg(F.sum("c_all").alias("__N"))
    out = (
        cells.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_risk",
            F.col("__N")
            - F.coalesce(F.sum("c_all").over(w_cum), F.lit(0)),
        )
        .withColumn(
            "__lnterm",
            F.when(
                (F.col("d") > 0) & (F.col("n_risk") > F.col("d")),
                F.log(
                    (F.col("n_risk") - F.col("d")).cast("double")
                    / F.col("n_risk")
                ),
            ).otherwise(F.lit(0.0)),
        )
        # Extinction (d == n_risk) makes the product exactly 0 from
        # that time on — handled as an explicit flag, NOT ln(0):
        # Spark's log(0) is NULL while DuckDB's is -inf, so the log
        # path would silently diverge between the twins.
        .withColumn(
            "__dead",
            F.max(
                F.when(
                    (F.col("d") > 0)
                    & (F.col("d") >= F.col("n_risk")),
                    1,
                ).otherwise(0)
            ).over(
                w_ord.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .withColumn(
            "surv_ppm",
            F.when(F.col("__dead") == 1, F.lit(0))
            .otherwise(
                F.round(
                    F.lit(1e6)
                    * F.exp(
                        F.sum("__lnterm").over(
                            w_ord.rowsBetween(
                                Window.unboundedPreceding,
                                Window.currentRow,
                            )
                        )
                    )
                )
            )
            .cast("long"),
        )
        .filter(F.col("d") > 0)
        .select("t", "n_risk", "d", "surv_ppm")
    )
    return out
