"""Event-stream analytics operators: sessionization (the classic
log-pipeline stateful operator) and rolling-window spike detection
(:func:`rolling_anomaly` — the alerting aggregate; see its docstring).

Sessionization assigns each event a per-user session sequence number,
where a gap > ``gap_minutes`` between consecutive events starts a new
session. Two planes, cross-validated by tests:
  - batch: window functions (lag + running sum over (user, ts)) — pure
    Catalyst, ANSI-SQL expressible, so the DuckDB oracle verifies it
    value-for-value. The shuffle is hash(user) — the partitioning
    sessionization inherently needs; within a partition it's one sort.
  - streaming: ``applyInPandasWithState`` — the custom-stateful-operator
    API: per-user state (last event time, current session seq) lives in
    the state store and spans micro-batches, so a session that straddles
    two batches keeps its number. State is two longs per user — at
    10^9-user scale that's the narrow state you want.

No reference analogue (the reference is stateless per event); this is a
§2.4 north-star pipeline operator.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_GAP_MINUTES = 30


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = DEFAULT_GAP_MINUTES,
) -> DataFrame:
    """Batch plane: (id, user, session_seq) with session_seq starting at 1
    per user. Orders by (ts, id) — the id tiebreak makes the output
    deterministic under timestamp ties, which the oracle comparison
    requires."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # ts may be TIMESTAMP_NTZ (no direct cast to long under ANSI): go via
    # timestamp — session tz is UTC (session.py), so the epoch is stable
    def _epoch(c):
        return c.cast("timestamp").cast("long")

    new_session = (
        prev_ts.isNull()
        | (_epoch(F.col(ts_col)) - _epoch(prev_ts) > gap_minutes * 60)
    ).cast("long")
    seq = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        F.col(id_col),
        F.col(user_col),
        seq.alias("session_seq"),
    )


_SESSION_OUT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
    ]
)
_SESSION_STATE = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),  # epoch seconds
        T.StructField("seq", T.LongType()),
    ]
)


def sessionize_streaming(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = DEFAULT_GAP_MINUTES,
) -> DataFrame:
    """Streaming plane: per-user (last_ts, seq) state in the state store.
    Within a batch, the group's rows are sorted by (ts, id) — same total
    order as the batch plane — so both planes agree on identical input."""
    import pandas as pd  # noqa: F401 (executor-side)

    gap_s = gap_minutes * 60

    def fn(key: Tuple, pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        if state.exists:
            last_ts, seq = state.get
        else:
            last_ts, seq = None, 0
        # materialize the WHOLE group before sorting: a group larger than
        # one Arrow batch arrives as multiple chunks with no global order —
        # sorting chunks independently would let last_ts regress and
        # silently diverge from the batch plane (round-2 advice)
        chunks = [c for c in pdfs if len(c)]
        out = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                [ts_col, id_col]
            )
            for eid, ts in zip(pdf[id_col], pdf[ts_col]):
                epoch = int(ts.timestamp())
                if last_ts is None or epoch - last_ts > gap_s:
                    seq += 1
                last_ts = epoch
                out.append((int(eid), int(key[0]), int(seq)))
        state.update((last_ts, seq))
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "session_seq"]
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def rolling_anomaly(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    bucket: str = "hour",
    trail: int = 3,
    threshold_pct: int = 200,
) -> DataFrame:
    """Rolling-window spike detection — the alerting aggregate of a log
    pipeline: bucket events per key into ``date_trunc(bucket)`` windows,
    then flag a bucket whose count exceeds ``threshold_pct`` percent of
    its TRAILING ``trail``-bucket average for that key. The comparison is
    the cross-multiplied integer test
    ``cnt * trail_buckets * 100 > trail_cnt * threshold_pct`` — no float
    average, engines/reruns agree exactly (house convention). Buckets
    with no trailing history never flag (cold start is not a spike).

    Frame semantics: the trailing window is over OBSERVED buckets
    (``ROWS BETWEEN trail PRECEDING AND 1 PRECEDING``), not wall-clock
    intervals — a key silent for a day compares against its last
    ``trail`` active buckets. That is the behavior an alerting pipeline
    usually wants for sparse keys; a wall-clock variant is the same plan
    with a RANGE interval frame.

    Returns ``(key, bucket, cnt, trail_cnt, trail_buckets, is_spike)``.

    Plan at 100 TB: the event stream collapses FIRST — one exchange keyed
    (key, bucket) carrying map-side partial counts — and the window
    function runs over the AGGREGATED frame: a second exchange keyed on
    the key alone, but carrying only (keys x active buckets) rows (for a
    year of hourly buckets, <9k rows per key), never events. WindowExec
    sorts within each key partition; no per-event work after the first
    aggregate.
    """
    if int(trail) < 1:
        raise ValueError("trail must be >= 1")
    reserved = {"bucket", "cnt", "trail_cnt", "trail_buckets", "is_spike"}
    if key_col in reserved:
        raise ValueError(
            f"key_col {key_col!r} collides with a rolling_anomaly output "
            f"column; rename the key column first (reserved: "
            f"{sorted(reserved)})"
        )
    counts = df.groupBy(
        F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(-int(trail), -1)
    )
    trail_cnt = F.coalesce(F.sum("cnt").over(w), F.lit(0))
    trail_buckets = F.count("cnt").over(w)
    spike = (trail_buckets > 0) & (
        F.col("cnt") * trail_buckets * F.lit(100)
        > trail_cnt * F.lit(int(threshold_pct))
    )
    return counts.select(
        F.col(key_col),
        "bucket",
        "cnt",
        trail_cnt.alias("trail_cnt"),
        trail_buckets.alias("trail_buckets"),
        spike.alias("is_spike"),
    )
