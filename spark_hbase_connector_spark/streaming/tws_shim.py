"""Vendor-free execution of the ``StatefulProcessor`` contract on the v1
``applyInPandasWithState`` API.

PySpark 4's ``transformWithStateInPandas`` (the arbitrary-state v2 API:
named state variables, timers, TTL) talks to the JVM state server over a
protobuf protocol, so it hard-requires the ``google.protobuf`` package —
absent in some deployments (this container included, no pip access).
Rather than gate the operator behind an ImportError, this shim runs the
SAME ``StatefulProcessor`` subclass on ``applyInPandasWithState``:

- named value states are kept in a per-key dict, pickled into a single
  ``binary`` GroupState column (v1 state is one struct per key);
- ``init`` runs once per key invocation with a handle whose
  ``getValueState`` returns a dict-backed stand-in honoring the
  ``exists() / get() / update(tuple) / clear()`` surface;
- ``handleInputRows(key, iterator-of-batches, timer_values)`` yields the
  output DataFrames straight through;
- **processing-time timers** (``time_mode="ProcessingTime"``, added r5):
  ``registerTimer / deleteTimer / listTimers`` on the handle are backed
  by a sorted expiry list carried inside the same pickled state; the v1
  ``GroupStateTimeout.ProcessingTimeTimeout`` is armed to the EARLIEST
  pending expiry after every invocation, and any invocation (input or
  v1 timeout wake-up) first runs input rows, then fires every timer
  whose expiry <= the batch's current processing time through
  ``handleExpiredTimer(key, timer_values, expired_timer_info)`` — the
  native end-of-batch firing order. The v1 model is per-key
  single-timeout, but since only the MINIMUM pending expiry ever needs
  arming, multiple named timers per key are expressed faithfully; the
  wake-up granularity (micro-batch boundaries) matches the native
  engine's, which also only fires timers when a batch runs.

Deliberately unsupported (loud ``NotImplementedError``, not silent
drift): event-time timers (``time_mode="EventTime"``), state TTL, and
list/map state — the remaining v2 surface that genuinely needs the
protobuf state server. Operators using named value states and
processing-time timers — the session-timeout-close family included —
run identically on either engine, so one processor class carries one
verified contract across both APIs (see ``events.running_totals_tws``
and ``events.session_close_processor``, oracle-checked in the registry
via the shim in this container and via the native API where protobuf
exists).
"""

from __future__ import annotations

import bisect
import pickle
from typing import Callable, Sequence

from pyspark.sql import DataFrame


class ShimValueState:
    """Dict-backed stand-in for the v2 ``ValueState`` handle surface."""

    def __init__(self, store: dict, name: str) -> None:
        self._store = store
        self._name = name

    def exists(self) -> bool:
        return self._name in self._store

    def get(self):
        return self._store.get(self._name)

    def update(self, value) -> None:
        self._store[self._name] = tuple(value)

    def clear(self) -> None:
        self._store.pop(self._name, None)


class ShimHandle:
    """Stand-in for ``StatefulProcessorHandle`` (value states + timers)."""

    def __init__(self, store: dict, timers: list | None = None) -> None:
        self._store = store
        self._timers = timers  # None = timers not enabled (time_mode None)

    def getValueState(self, name: str, schema=None, ttl_duration_ms=None):
        if ttl_duration_ms is not None:
            raise NotImplementedError(
                "tws shim: state TTL requires the native "
                "transformWithStateInPandas (google.protobuf)"
            )
        return ShimValueState(self._store, name)

    def registerTimer(self, expiryTimestampMs: int) -> None:
        if self._timers is None:
            raise NotImplementedError(
                "tws shim: registerTimer requires "
                "time_mode='ProcessingTime' (timers are disabled under "
                "time_mode='None', matching the native API)"
            )
        t = int(expiryTimestampMs)
        i = bisect.bisect_left(self._timers, t)
        if i == len(self._timers) or self._timers[i] != t:
            self._timers.insert(i, t)

    def deleteTimer(self, expiryTimestampMs: int) -> None:
        if self._timers is None:
            raise NotImplementedError(
                "tws shim: deleteTimer requires time_mode='ProcessingTime'"
            )
        t = int(expiryTimestampMs)
        i = bisect.bisect_left(self._timers, t)
        if i < len(self._timers) and self._timers[i] == t:
            self._timers.pop(i)

    def listTimers(self):
        if self._timers is None:
            raise NotImplementedError(
                "tws shim: listTimers requires time_mode='ProcessingTime'"
            )
        return iter(list(self._timers))

    def __getattr__(self, item):  # getListState / getMapState / ...
        raise NotImplementedError(
            f"tws shim: StatefulProcessorHandle.{item} requires the native "
            "transformWithStateInPandas (google.protobuf)"
        )


def transform_with_state_shim(
    df: DataFrame,
    key_cols: Sequence[str],
    processor_factory: Callable[[], object],
    output_schema: str,
    output_mode: str = "append",
    time_mode: str = "None",
) -> DataFrame:
    """Run a ``StatefulProcessor`` (built via ``processor_factory``) on
    ``applyInPandasWithState``. ``time_mode`` may be ``"None"`` or
    ``"ProcessingTime"`` (processing-time timers); event-time timers are
    a documented non-goal of the shim."""
    if time_mode not in ("None", "ProcessingTime"):
        raise NotImplementedError(
            "tws shim: only timeMode 'None' and 'ProcessingTime' are "
            "supported; event-time timers require the native "
            "transformWithStateInPandas (google.protobuf)"
        )
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        TimerValues,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    use_timers = time_mode == "ProcessingTime"

    def fn(key, pdfs, state):
        if state.exists:
            store, timers = pickle.loads(state.get[0])
        else:
            store, timers = {}, []
        now = state.getCurrentProcessingTimeMs()
        try:  # no watermark on the query -> v1 raises; native reports -1
            wm = state.getCurrentWatermarkMs()
        except Exception:
            wm = -1
        tv = TimerValues(now, wm)
        proc = processor_factory()
        proc.init(ShimHandle(store, timers if use_timers else None))
        if not state.hasTimedOut:
            out = proc.handleInputRows(key, pdfs, tv)
            if out is not None:
                yield from out
        # end-of-batch timer firing (native order: input first, then every
        # timer expired at this batch's processing time, earliest first —
        # including timers registered during this very invocation)
        while timers and timers[0] <= now:
            t = timers.pop(0)
            out = proc.handleExpiredTimer(key, tv, ExpiredTimerInfo(t))
            if out is not None:
                yield from out
        proc.close()
        if store or timers:
            state.update((pickle.dumps((store, timers)),))
            if timers:
                # arm the v1 single timeout to the earliest pending expiry
                state.setTimeoutDuration(max(1, timers[0] - now))
        elif state.exists:
            state.remove()

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="s binary",
        outputMode=output_mode,
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timers
            else GroupStateTimeout.NoTimeout
        ),
    )
