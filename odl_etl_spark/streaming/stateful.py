"""Arbitrary stateful streaming: per-key running state via
``applyInPandasWithState``.

The escape hatch for operators windowed aggregation can't express —
running counters, per-entity session machines, online feature state.
State is a per-key struct persisted in the state store across
micro-batches; the callback sees each key's new rows as pandas
DataFrames (Arrow-batched, not row-at-a-time).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
# State carries the money sum as integer CENTS (the house scaled-BIGINT
# convention, same as the driver-oracled batch twin stream_running_totals):
# integer accumulation is order-free across micro-batches and replays,
# so the stream and the batch replay agree on every input — not just on
# data that happens to be exact 2-decimal amounts.
RUNNING_STATE = StructType(
    [StructField("n", LongType()), StructField("total_cents", LongType())]
)


def _update_running(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Per-event half-away-from-zero cents — bit-identical to Spark's
        # F.round(value*100) in the batch key (numpy .round() would be
        # half-even and could diverge on an exact .5 boundary).
        # Null handling: null -> NaN via to_numpy, and the finite mask
        # drops it, matching F.sum's null-skipping semantics exactly;
        # n_events still counts the row (COUNT(*)). An unmasked NaN
        # would be worse than a wrong value: np.sign(NaN)
        # .astype('int64') is INT64_MIN and corrupts the running state
        # FOREVER. +/-inf contract (ADVICE r12 #1): non-finite NON-NULL
        # values are OUT OF CONTRACT for the running-totals key on both
        # paths — this mask drops them (state stays sane), while the
        # batch twin's ROUND(inf*100)::BIGINT would push a saturated
        # garbage term into its sum, so an inf input has no defined
        # stream==batch parity. 'value' is money; inf is upstream
        # corruption, and the stream side refusing to poison per-key
        # state is the deliberate half of that behavior.
        y = pdf["value"].to_numpy(dtype="float64") * 100.0
        y = y[np.isfinite(y)]
        cents += int(np.sign(y).astype("int64") @ np.floor(np.abs(y) + 0.5).astype("int64"))
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) emitted every micro-batch the
    user appears in. Works on a stream (stateful) or, for testing, on a
    batch frame (single 'micro-batch')."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4): the successor stateful API
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-user running (count, sum(value)) on the Spark 4
        ``transformWithStateInPandas`` API — typed composite state
        (ValueState), explicit init/close lifecycle, per-key timers
        available. Functionally identical to ``running_user_totals``;
        the new API adds schema'd state (queryable via the state data
        source), multiple state variables per key, and TTL support —
        the long-term home for custom stateful operators.

        Runtime dependency: the transformWithState state protocol talks
        protobuf between the JVM and the Python state server, so running
        a query requires ``google.protobuf`` (the replay test skips with
        reason where it is absent; ``running_user_totals`` covers the
        same semantics on applyInPandasWithState without it)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", RUNNING_STATE)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            import numpy as np

            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                # Same integer-cents convention as _update_running,
                # including the non-finite mask (F.sum skips nulls;
                # +/-inf is out of contract on both paths — see the
                # _update_running comment, ADVICE r12 #1).
                y = pdf["value"].to_numpy(dtype="float64") * 100.0
                y = y[np.isfinite(y)]
                cents += int(
                    np.sign(y).astype("int64")
                    @ np.floor(np.abs(y) + 0.5).astype("int64")
                )
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
            )

        def close(self) -> None:
            pass

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        """``running_user_totals`` on the transformWithState API."""
        return events.groupBy("user_id").transformWithStateInPandas(
            RunningTotalsProcessor(),
            outputStructType=RUNNING_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover — pre-4.0 Spark
    RunningTotalsProcessor = None  # type: ignore[assignment]

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        raise NotImplementedError("transformWithState requires Spark >= 4.0")
