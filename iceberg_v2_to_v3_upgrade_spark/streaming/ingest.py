"""Streaming ingestion into the mutable-table module.

``foreachBatch`` bridges Structured Streaming and the snapshot-versioned
LocalTable: each micro-batch commits one append snapshot (exactly-once per
batch via the checkpoint), after which the table's full DML surface —
MoR deletes/updates, compaction, time travel — applies to streamed data.

This is the streaming counterpart of the reference's INSERT path: a
continuously appended Iceberg table instead of a one-shot VALUES batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from iceberg_v2_to_v3_upgrade_spark.tables.table import LocalTable


def stream_into_table(
    stream_df: DataFrame,
    table: LocalTable,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and for availableNow: drain) a stream appending into
    ``table``. Returns the StreamingQuery."""

    def _append_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.insert(batch_df)

    writer = (
        stream_df.writeStream.foreachBatch(_append_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:
        query = writer.start()
    return query
