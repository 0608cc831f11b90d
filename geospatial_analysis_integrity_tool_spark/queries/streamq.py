"""Gated STREAMING query: first-seen condition dedup replay.

The stateful operator (streaming/stateful.dedup_first_seen,
applyInPandasWithState keyed on the condition identity — the incremental
form of GAIT's duplicate-condition elimination, DC_FreadFwrite*
errors.c:1361) runs here against a REAL micro-batch stream: a deterministic
detection log is written as one parquet file per batch, read back with
``readStream`` + ``maxFilesPerTrigger=1`` (so the state machine sees many
batches), and the emitted rows land in a memory sink that the gate compares
against a closed-form DuckDB oracle.

Determinism under re-batching: the operator emits, per key, the minimum
(batch_idx, payload) row.  Even if the file source coalesces several files
into one micro-batch, sorting by (batch_idx, payload) inside the batch
reproduces the per-file arrival order, so the emitted set equals the
oracle's ``row_number() OVER (PARTITION BY key ORDER BY batch_idx, payload)
= 1`` regardless of trigger boundaries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

N_ROWS = 600
N_PER_BATCH = 120
N_KEYS = 240

_SCHEMA = "cond_key long, batch_idx long, payload long"


def write_stream_fixture(dirpath: str | None = None) -> str:
    import pandas as pd

    from ..sources.fixtures import fixture_dir

    if dirpath is None:
        dirpath = fixture_dir("stream_v1")
    if os.path.exists(os.path.join(dirpath, "_done")):
        return dirpath
    rows = [
        {
            "cond_key": (i * 7) % N_KEYS,
            "batch_idx": i // N_PER_BATCH,
            "payload": i,
        }
        for i in range(N_ROWS)
    ]
    df = pd.DataFrame(rows)
    for b, grp in df.groupby("batch_idx"):
        grp.to_parquet(os.path.join(dirpath, f"b{int(b):03d}.parquet"))
    open(os.path.join(dirpath, "_done"), "w").write("ok")
    return dirpath


def q_streaming_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import dedup_first_seen

    d = write_stream_fixture()
    for q in spark.streams.active:
        if q.name == "first_seen_replay_sink":
            q.stop()
    src = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = dedup_first_seen(
        src, key_cols=["cond_key"], payload_cols=["batch_idx", "payload"]
    )
    # The state-store partition count is frozen from spark.sql.shuffle.partitions
    # at stream start.  The replay fixture is 5 micro-batches of 120 rows; at the
    # session default (32) every tiny batch commits 32 state-store partitions,
    # which is pure per-task overhead.  Pin a small count for the stream only —
    # real deployments size this to the keyspace, not the session default.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("first_seen_replay_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination(300)
    return spark.table("first_seen_replay_sink").select(
        "cond_key", "batch_idx", "payload"
    )


ORACLE_STREAMING_FIRST_SEEN = f"""
WITH src AS (
  SELECT (i * 7) % {N_KEYS} AS cond_key,
         i // {N_PER_BATCH} AS batch_idx,
         i AS payload
  FROM (SELECT unnest(range(0, {N_ROWS})) AS i)
),
ranked AS (
  SELECT cond_key, batch_idx, payload,
         row_number() OVER (PARTITION BY cond_key
                            ORDER BY batch_idx, payload) AS rn
  FROM src
)
SELECT CAST(cond_key AS BIGINT) AS cond_key,
       CAST(batch_idx AS BIGINT) AS batch_idx,
       CAST(payload AS BIGINT) AS payload
FROM ranked WHERE rn = 1
"""

QUERIES = {"streaming_first_seen": q_streaming_first_seen}
ORACLES = {"streaming_first_seen": ORACLE_STREAMING_FIRST_SEEN}
