"""Custom stateful streaming operators (`applyInPandasWithState`) and
built-in session windows — the beyond-reference streaming surface
(SURVEY §2.8 notes the reference has no stateful aggregation; a
training-data pipeline needs at least streaming dedup and running
per-key materialization).

All operators work on BOTH batch and streaming DataFrames where Spark
allows it; the `applyInPandasWithState` paths are streaming-only by API
and have batch twins in plans/ for the oracle gate.

Scale notes: state lives in the state store keyed by the grouping key —
shuffle is one exchange on the key, state size is O(distinct keys);
watermarks bound it for session windows.  Arrow moves each group's rows
as pandas batches (never row-at-a-time Python).

State-schema compatibility: RUNNING_STATE_SCHEMA widened from
(n, last) to (n, last, last_seq) — there is no migration path for
checkpoints written under the old schema, so restarting an existing
query after upgrading requires a NEW checkpoint directory (acceptable
for this bench harness; a production rollout would version the state
and migrate on read).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("last_value", LongType()),
    ]
)
RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("last", LongType()),
        StructField("last_seq", LongType()),
    ]
)


def running_counts(grouped):
    """Per-key running (count, last_value) maintained across micro-batches
    — the minimal CDC-style materializer as a custom stateful operator.

    Usage: ``stream.groupBy("key").applyInPandasWithState(... )`` via
    this wrapper: ``running_counts(stream.groupBy("key"))``.  Emits one
    row per key per micro-batch that touched it (update semantics).

    ``last_value`` is the value at the maximum ``seq`` seen so far —
    tracked as (max_seq, value_at_max_seq) across Arrow chunks AND across
    micro-batches (the seq is persisted in state), because a key's rows
    within one micro-batch may span multiple pandas chunks in no global
    seq order, and a replayed/late micro-batch may carry lower seqs.
    """

    def fn(key, pdf_iter, state: GroupState):
        n, last, last_seq = state.get if state.exists else (0, None, None)
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            n += len(pdf)
            i = pdf["seq"].idxmax()
            chunk_seq = int(pdf["seq"].loc[i])
            if last_seq is None or chunk_seq >= last_seq:
                last_seq = chunk_seq
                last = int(pdf["value"].loc[i])
        state.update((n, last, last_seq))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "last_value": [last]}
        )

    return grouped.applyInPandasWithState(
        fn,
        RUNNING_OUT_SCHEMA,
        RUNNING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


DEDUP_OUT_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("first_seq", LongType())]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def streaming_first_seen(grouped):
    """Streaming exact-dedup: emit each key exactly once (its first
    occurrence, by ``seq``) across all micro-batches; later occurrences
    are absorbed by the per-key state.  The stateful twin of
    ``dedup.dedup_exact`` — use for continuous corpus ingestion where
    `dropDuplicates` + watermark would evict state too early."""

    def fn(key, pdf_iter, state: GroupState):
        first = None
        for pdf in pdf_iter:
            if len(pdf):
                m = int(pdf["seq"].min())
                first = m if first is None else min(first, m)
        if not state.exists and first is not None:
            state.update((first,))
            yield pd.DataFrame({"key": [key[0]], "first_seq": [first]})

    return grouped.applyInPandasWithState(
        fn,
        DEDUP_OUT_SCHEMA,
        DEDUP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Built-in gap session windows (F.session_window): works on batch
    DataFrames directly and on streams with a watermark.  Emits
    (user, session_start_ms, n_events).

    Note the semantic difference vs `operators/temporal.sessionize`:
    session_window closes a session when the NEXT event is > gap after
    the PREVIOUS one — identical gap rule, but window bounds are
    [min_ts, last_ts + gap)."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
    )


FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user", LongType()),
        StructField("stage", LongType()),
        StructField("t_stage", LongType()),
    ]
)
FUNNEL_STATE_SCHEMA = StructType(
    [StructField("stage", LongType()), StructField("t", LongType())]
)


def streaming_funnel(grouped, steps: tuple[str, ...]):
    """Streaming ordered-funnel tracker — the stateful twin of
    ``temporal.funnel_counts``: per user, the state is only the
    FRONTIER (completed prefix length, timestamp of its last step); a
    ts-ascending scan that advances on the first next-step event with
    ``ms > t`` reproduces the batch first-reach recurrence exactly
    (ascending order makes the first match the MIN, one event advances
    at most one stage).  Emits (user, stage, t_stage) whenever a user's
    frontier advances (update semantics) — the funnel report is a
    latest-wins count of ``stage >= k`` over the sink.

    Contract (every frontier state machine has it): equals the batch
    funnel when each user's event time is NON-DECREASING across
    micro-batches (the ordered-ingest / availableNow file contract).
    Only the frontier is stored, so an event that could have chained
    off a DISCARDED future event (late cross-batch reordering) cannot
    be recovered — by design: per-user state is 2 longs, never an
    event buffer, the 100 TB property.  Within one micro-batch arrival
    order is irrelevant (rows sort by ms before the scan).

    Input rows per group: (user long, ms long, step string)."""
    n_steps = len(steps)

    def fn(key, pdf_iter, state: GroupState):
        stage, t = state.get if state.exists else (0, None)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        changed = False
        if chunks:
            pdf = pd.concat(chunks).sort_values("ms", kind="mergesort")
            for ms, s in zip(pdf["ms"], pdf["step"]):
                if stage >= n_steps:
                    break
                if s == steps[stage] and (stage == 0 or int(ms) > t):
                    stage += 1
                    t = int(ms)
                    changed = True
        if changed:
            state.update((stage, t))
            yield pd.DataFrame(
                {"user": [key[0]], "stage": [stage], "t_stage": [t]}
            )

    return grouped.applyInPandasWithState(
        fn,
        FUNNEL_OUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


RETENTION_OUT_SCHEMA = StructType(
    [
        StructField("cohort_period", LongType()),
        StructField("period_offset", LongType()),
        StructField("user", LongType()),
    ]
)
RETENTION_STATE_SCHEMA = StructType(
    [StructField("cohort", LongType()), StructField("emitted", LongType())]
)


def streaming_retention(grouped, period_ms: int, horizon: int = 64):
    """Streaming cohort-retention tracker — the stateful twin of
    ``temporal.retention_cohorts``: per user the state is (cohort
    period, emitted-offset BITMASK) — exactly 2 longs, which is why
    ``horizon`` is capped at 64 periods (~15 months of weekly cohorts;
    offsets past the horizon are dropped, the documented window).
    Each (user, offset) pair is emitted EXACTLY ONCE across all
    micro-batches (append semantics, the ``streaming_first_seen``
    shape), so the retention matrix is a plain COUNT over the sink
    grouped by (cohort_period, period_offset) — no latest-wins
    reconciliation needed.

    Contract: equals the batch matrix when each user's FIRST-period
    activity arrives before later periods (ordered ingest — the cohort
    is pinned by the first batch that touches the user; an
    earlier-period event arriving later cannot re-cohort, by design:
    no event history is stored).

    Input rows per group: (user long, ms long)."""
    if not 1 <= horizon <= 64:
        raise ValueError("horizon must be in [1, 64] (one-long bitmask)")

    def fn(key, pdf_iter, state: GroupState):
        cohort, emitted = state.get if state.exists else (None, 0)
        periods = set()
        for pdf in pdf_iter:
            if len(pdf):
                periods.update(int(v) // period_ms for v in pdf["ms"])
        if not periods:
            return
        if cohort is None:
            cohort = min(periods)
        new_offsets = sorted(
            off
            for off in ((p - cohort) for p in periods)
            if 0 <= off < horizon and not (emitted >> off) & 1
        )
        for off in new_offsets:
            emitted |= 1 << off
        state.update((cohort, emitted))
        if new_offsets:
            yield pd.DataFrame(
                {
                    "cohort_period": [cohort] * len(new_offsets),
                    "period_offset": new_offsets,
                    "user": [key[0]] * len(new_offsets),
                }
            )

    return grouped.applyInPandasWithState(
        fn,
        RETENTION_OUT_SCHEMA,
        RETENTION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
