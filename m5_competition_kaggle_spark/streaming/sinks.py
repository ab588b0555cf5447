"""Streaming sinks: exactly-once file output via idempotent foreachBatch.

Structured Streaming's checkpoint gives at-least-once batch REPLAY on
restart; end-to-end exactly-once for a file sink needs the write itself
to be idempotent per micro-batch. The standard recipe (Spark docs,
"foreachBatch"): key the output location by ``batch_id`` and overwrite —
a replayed batch clobbers its own partial output instead of appending
duplicates. ``trigger(availableNow=True)`` drains the backlog in bounded
micro-batches and stops, which is how a 100 TB backfill runs the same
streaming code as the live tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Start an exactly-once parquet sink: one ``batch_id=N`` directory
    per micro-batch, overwritten on replay. Returns the StreamingQuery
    (caller awaits termination)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
