"""Custom stateful streaming operators (`applyInPandasWithState`).

The reference's only stateful streaming operator is the fork-aware
ProcessBlock handler (pipeline.go:330-439), covered by streaming/ingest.py.
This module supplies the *general* arbitrary-state surface the Spark build
exposes beyond the reference (SURVEY §2.6 "stateful ops" row): per-key
session state carried across micro-batches in a GroupState, the pattern the
built-in windowed aggregates can't express.

Scale notes: the grouped stream shuffles once on the key; state lives in the
executor state store (RocksDB on a real cluster), sized O(|active keys|) —
one small fixed-width tuple per user here. The per-group pandas fold is
vectorized (cumsum over gap flags), not row-at-a-time Python.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SESSION_GAP_US = 30 * 60 * 1_000_000

# (last_us, open_session_events, closed_sessions, closed_max, total_events)
_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("cur_n", LongType()),
        StructField("closed", LongType()),
        StructField("closed_max", LongType()),
        StructField("total", LongType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("max_session_events", LongType()),
        StructField("avg_session_events", DoubleType()),
    ]
)


def _round_half_up(x: float, digits: int = 4) -> float:
    scale = 10**digits
    return math.floor(x * scale + 0.5) / scale


def _sessionize_group(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    last_us, cur_n, closed, closed_max, total = (
        state.get if state.exists else (None, 0, 0, 0, 0)
    )
    rows = pd.concat(list(pdfs)).sort_values(["us", "event_id"])
    if len(rows):
        us = rows["us"].to_numpy()
        prev = rows["us"].shift(1)
        prev.iloc[0] = last_us if last_us is not None else float("nan")
        gaps = prev.isna().to_numpy() | (
            (us - prev.to_numpy()) > SESSION_GAP_US
        )
        # ordered run lengths between session starts (vectorized fold)
        seg_sizes = (
            pd.Series(1, index=rows.index).groupby(gaps.cumsum()).sum()
        )
        starts_new = gaps[0]
        for i, cnt in enumerate(seg_sizes):
            if i == 0 and not starts_new:
                cur_n += int(cnt)
            else:
                if cur_n > 0:
                    closed += 1
                    closed_max = max(closed_max, cur_n)
                cur_n = int(cnt)
        total += len(rows)
        last_us = int(us[-1])
    state.update((last_us, cur_n, closed, closed_max, total))
    n_sessions = closed + (1 if cur_n > 0 else 0)
    if n_sessions == 0:
        return
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "max_session_events": [max(closed_max, cur_n)],
            "avg_session_events": [_round_half_up(total / n_sessions)],
        }
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user 30-min-gap session stats over a *streaming* events frame.

    Emits, per micro-batch and per active user, the user's cumulative
    (n_sessions, max_session_events, avg_session_events) — identical to the
    batch `sessionization` catalog query once the stream is drained, which is
    exactly how it is oracle-checked. The open session is counted (as the
    batch form does); it simply keeps extending in state until a later batch
    crosses the gap.
    """
    assert gap_minutes == 30, "gap is fixed to match the oracle query"
    prepared = events.select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming KMV sketch (distinct-set algebra over a stream) ---------------
#
# State per group is EXACTLY the sketch: the k smallest distinct hash
# values seen so far plus a monotone seen-counter (the "ver" the reader
# uses to pick each group's newest emission from an update-mode sink).
# The merge is a bounded set union + trim — a value cut from the k
# smallest can never re-enter, so discarding it is lossless — which is
# why KMV streams where exact distinct state cannot: state is k longs
# per group forever. Hashing happens JVM-side (hash60 in the prepared
# projection), so the pandas fold only merges integers.

_KMV_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("hs", ArrayType(LongType())),
    ]
)

_KMV_OUT_SCHEMA = StructType(
    [
        StructField("g", StringType()),
        StructField("ver", LongType()),
        StructField("hs", ArrayType(LongType())),
    ]
)


def _kmv_group(
    key: tuple,
    pdfs: "Iterator[pd.DataFrame]",
    state: GroupState,
) -> "Iterator[pd.DataFrame]":
    import numpy as np
    import pandas as pd

    from fluxdb_spark.functions.text import KMV_K

    if state.exists:
        n_seen, hs = state.get
        hs = np.asarray(hs, dtype=np.int64)
    else:
        n_seen, hs = 0, np.empty(0, dtype=np.int64)
    for pdf in pdfs:
        vals = pdf["h"].to_numpy(dtype=np.int64)
        n_seen += len(vals)
        hs = np.union1d(hs, vals)[:KMV_K]
    state.update((int(n_seen), [int(v) for v in hs]))
    yield pd.DataFrame(
        {"g": [key[0]], "ver": [int(n_seen)], "hs": [[int(v) for v in hs]]}
    )


def kmv_stream(
    rows: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
) -> DataFrame:
    """KMV sketches over a streaming frame: (g, ver, hs) per group per
    micro-batch, `hs` sorted ascending and at most KMV_K long. Drain,
    keep each group's max-ver row, posexplode hs to rebuild the
    (g, h, rn) sketch relation, and hand it to
    `text.kmv_overlap_from_sketches` — bit-identical to the batch
    sketch over the same data."""
    from fluxdb_spark.functions.hashing import hash60

    prepared = rows.select(
        F.col(group_col).alias("g"),
        hash60(F.col(key_col).cast("string")).alias("h"),
    )
    return prepared.groupBy("g").applyInPandasWithState(
        _kmv_group,
        outputStructType=_KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming weighted reservoir (exactly-k WOR over a stream) ---------------
#
# State per group is EXACTLY the sample: the k best (priority, id, weight)
# triples under the Efraimidis-Spirtakis key (functions/curation.wor_priority)
# plus a monotone seen-counter. A row cut from the top-k can never re-enter
# (its priority is fixed at ingest), so the trim is lossless — the same
# argument that bounds the KMV sketch above — and the drained reservoir is
# bit-identical to the batch top-k over the same rows, which is what the SQL
# twin checks. Priorities are computed JVM-side in the prepared projection;
# the pandas fold only sorts integers.

WOR_STREAM_K = 10

_WOR_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("pris", ArrayType(LongType())),
        StructField("ids", ArrayType(LongType())),
        StructField("ws", ArrayType(LongType())),
    ]
)

_WOR_OUT_SCHEMA = StructType(
    [
        StructField("g", StringType()),
        StructField("ver", LongType()),
        StructField("pris", ArrayType(LongType())),
        StructField("ids", ArrayType(LongType())),
        StructField("ws", ArrayType(LongType())),
    ]
)


def _wor_group_fn(k: int):
    """Bind the reservoir size into the stateful fold.  k is a plan
    constant (it defines the state shape), so it travels as a closure —
    every caller passes the SAME k its batch/SQL twin uses, instead of
    silently inheriting a module constant (ADVICE r11)."""

    def _wor_group(
        key: tuple,
        pdfs: "Iterator[pd.DataFrame]",
        state: GroupState,
    ) -> "Iterator[pd.DataFrame]":
        import numpy as np
        import pandas as pd

        if state.exists:
            n_seen, pris, ids, ws = state.get
            pris = np.asarray(pris, dtype=np.int64)
            ids = np.asarray(ids, dtype=np.int64)
            ws = np.asarray(ws, dtype=np.int64)
        else:
            n_seen = 0
            pris = ids = ws = np.empty(0, dtype=np.int64)
        for pdf in pdfs:
            n_seen += len(pdf)
            # rows with NULL priority (wor_priority's non-positive-weight
            # guard, or a NULL weight) are unsampleable: arrow delivers
            # them as NaN, which would crash the int64 cast — drop them
            # from the reservoir (they still count toward ver/n_seen),
            # matching the batch draw, which excludes NULL priorities
            # the same way
            pdf = pdf.dropna(subset=["pri", "w"])
            pris = np.concatenate(
                [pris, pdf["pri"].to_numpy(dtype=np.int64)]
            )
            ids = np.concatenate([ids, pdf["id"].to_numpy(dtype=np.int64)])
            ws = np.concatenate([ws, pdf["w"].to_numpy(dtype=np.int64)])
            # priority DESC, id ASC — lexsort's last key is primary
            order = np.lexsort((ids, -pris))[:k]
            pris, ids, ws = pris[order], ids[order], ws[order]
        state.update(
            (
                int(n_seen),
                [int(v) for v in pris],
                [int(v) for v in ids],
                [int(v) for v in ws],
            )
        )
        yield pd.DataFrame(
            {
                "g": [key[0]],
                "ver": [int(n_seen)],
                "pris": [[int(v) for v in pris]],
                "ids": [[int(v) for v in ids]],
                "ws": [[int(v) for v in ws]],
            }
        )

    return _wor_group


# default-k binding, kept importable for the unit tests that drive the
# fold directly
_wor_group = _wor_group_fn(WOR_STREAM_K)


def wor_stream(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WOR_STREAM_K,
) -> DataFrame:
    """Per-group weighted reservoirs over a streaming frame: (g, ver,
    pris, ids, ws) per group per micro-batch, the arrays at most
    WOR_STREAM_K long and ordered (priority DESC, id ASC). Drain, keep
    each group's max-ver row, posexplode the arrays — bit-identical to
    the batch per-group top-k under the same key (ES 2006 A-Res: the
    reservoir IS the running top-k of fixed per-row priorities)."""
    from fluxdb_spark.functions.curation import wor_priority
    from fluxdb_spark.functions.text import token_count

    w = token_count(F.col(text_col)).cast("long")
    prepared = docs.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        w.alias("w"),
    ).withColumn("pri", wor_priority(F.col("id"), F.col("w")))
    return topk_stream(prepared, k=k)


def topk_stream(prepared: DataFrame, k: int = WOR_STREAM_K) -> DataFrame:
    """The generic streaming per-group top-k-by-fixed-priority fold:
    takes an already-prepared (g, id, w, pri) frame and maintains each
    group's k best rows as GroupState. Any fixed per-row priority works
    — the ES sampling key (`wor_stream`), a centroid distance (the
    anomaly watchlist), a score — because the lossless-trim argument
    only needs priorities that never change after ingest. Pass the SAME
    k the batch/SQL twin uses — the trim size is part of the contract,
    not a tuning knob (ADVICE r11)."""
    return prepared.groupBy("g").applyInPandasWithState(
        _wor_group_fn(k),
        outputStructType=_WOR_OUT_SCHEMA,
        stateStructType=_WOR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
