"""Vendor-free execution of the ``StatefulProcessor`` contract on the v1
``applyInPandasWithState`` API.

PySpark 4's ``transformWithStateInPandas`` (the arbitrary-state v2 API:
named state variables, timers, TTL) talks to the JVM state server over a
protobuf protocol, so it hard-requires the ``google.protobuf`` package —
absent in some deployments (this container included, no pip access).
Rather than gate the operator behind an ImportError, this shim runs the
SAME ``StatefulProcessor`` subclass on ``applyInPandasWithState``:

- named state variables — **value, list, AND map state (list/map added
  r5)** — are kept in a per-key dict, pickled into a single ``binary``
  GroupState column (v1 state is one struct per key). Each stand-in
  honors the exact v2 method surface (``ListState.appendValue /
  appendList / put / get / exists / clear``; ``MapState.getValue /
  containsKey / updateValue / iterator / keys / values / removeKey /
  clear / exists``), so one processor class runs unchanged on either
  engine;
- **state TTL** (``ttlDurationMs`` on getValueState/getListState/
  getMapState, added r5): mirrors the native processing-time TTL
  granularity — ValueState expires whole, ListState per appended
  element, MapState per key-value entry, each ``ttlDurationMs`` after
  its last write. The shim's clock is the batch's current processing
  time (the native engine also evaluates TTL against the batch clock);
  expired entries are filtered at access AND swept at pickle time so
  state never grows past its live set;
- ``init`` runs once per key invocation with a handle whose getters
  return the dict-backed stand-ins; ``deleteIfExists`` drops a named
  variable;
- ``handleInputRows(key, iterator-of-batches, timer_values)`` yields the
  output DataFrames straight through;
- **processing-time timers** (``time_mode="ProcessingTime"``, r5):
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
  engine's, which also only fires timers when a batch runs;
- **event-time timers** (``time_mode="EventTime"``, added r5): the same
  timer list compared against the batch's CURRENT WATERMARK instead of
  its processing time, armed onto the v1
  ``GroupStateTimeout.EventTimeTimeout`` via ``setTimeoutTimestamp`` —
  v1 wakes the key when the watermark passes the armed timestamp,
  exactly the native v2 firing condition. Requires ``withWatermark`` on
  the input (the v1 API enforces it; the native engine likewise needs a
  watermark for event-time timers to ever fire). Arming is safe by
  construction: the firing loop has already consumed every expiry <=
  watermark, so the armed timestamp is strictly in the watermark's
  future as v1 requires.

Nothing of the v2 state surface remains unsupported: value/list/map
state, TTL, processing-time and event-time timers all run vendor-free.
(``handleInitialState`` — a v2 convenience for seeding state from a
batch DataFrame — is not part of the shim's entry point; seed state by
unioning a tagged prelude stream, the standard v1 idiom.)

Operators using this contract — the session-timeout-close and
watermark-flush families included — run identically on either engine,
so one processor class carries one verified contract across both APIs
(see ``events.running_totals_tws`` and ``events.session_close_processor``,
oracle-checked in the registry via the shim in this container and via
the native API where protobuf exists).
"""

from __future__ import annotations

import bisect
import pickle
from typing import Callable, Sequence

from pyspark.sql import DataFrame

# store entry tags: name -> ("v", value, expiry) | ("l", [(v, expiry), ...])
#                        | ("m", {key: (v, expiry)})
_VALUE, _LIST, _MAP = "v", "l", "m"


def _live(expiry, now: int) -> bool:
    return expiry is None or expiry > now


class ShimValueState:
    """Dict-backed stand-in for the v2 ``ValueState`` surface (TTL-aware:
    the whole value expires ``ttl`` ms after its last ``update``)."""

    def __init__(self, store: dict, name: str, now: int, ttl: int | None) -> None:
        self._store, self._name, self._now, self._ttl = store, name, now, ttl

    def _entry(self):
        e = self._store.get(self._name)
        if e is not None and not _live(e[2], self._now):
            self._store.pop(self._name, None)
            return None
        return e

    def exists(self) -> bool:
        return self._entry() is not None

    def get(self):
        e = self._entry()
        return None if e is None else e[1]

    def update(self, value) -> None:
        expiry = None if self._ttl is None else self._now + self._ttl
        self._store[self._name] = (_VALUE, tuple(value), expiry)

    def clear(self) -> None:
        self._store.pop(self._name, None)


class ShimListState:
    """Dict-backed stand-in for the v2 ``ListState`` surface. TTL is
    per-element, matching the native engine: each appended value expires
    ``ttl`` ms after ITS append (``put`` restamps every element)."""

    def __init__(self, store: dict, name: str, now: int, ttl: int | None) -> None:
        self._store, self._name, self._now, self._ttl = store, name, now, ttl

    def _elems(self) -> list:
        e = self._store.get(self._name)
        if e is None:
            return []
        live = [p for p in e[1] if _live(p[1], self._now)]
        if not live:
            self._store.pop(self._name, None)
            return []
        if len(live) != len(e[1]):
            self._store[self._name] = (_LIST, live)
        return live

    def _expiry(self):
        return None if self._ttl is None else self._now + self._ttl

    def exists(self) -> bool:
        return bool(self._elems())

    def get(self):
        return iter([p[0] for p in self._elems()])

    def put(self, newState) -> None:
        exp = self._expiry()
        elems = [(tuple(v), exp) for v in newState]
        if elems:
            self._store[self._name] = (_LIST, elems)
        else:
            self._store.pop(self._name, None)

    def appendValue(self, newState) -> None:
        elems = self._elems()
        elems.append((tuple(newState), self._expiry()))
        self._store[self._name] = (_LIST, elems)

    def appendList(self, newState) -> None:
        elems = self._elems()
        exp = self._expiry()
        elems.extend((tuple(v), exp) for v in newState)
        if elems:
            self._store[self._name] = (_LIST, elems)

    def clear(self) -> None:
        self._store.pop(self._name, None)


class ShimMapState:
    """Dict-backed stand-in for the v2 ``MapState`` surface. TTL is per
    key-value entry, matching the native engine: an entry expires ``ttl``
    ms after its last ``updateValue``."""

    def __init__(self, store: dict, name: str, now: int, ttl: int | None) -> None:
        self._store, self._name, self._now, self._ttl = store, name, now, ttl

    def _map(self) -> dict:
        e = self._store.get(self._name)
        if e is None:
            return {}
        live = {k: p for k, p in e[1].items() if _live(p[1], self._now)}
        if not live:
            self._store.pop(self._name, None)
            return {}
        if len(live) != len(e[1]):
            self._store[self._name] = (_MAP, live)
        return live

    def exists(self) -> bool:
        return bool(self._map())

    def getValue(self, key):
        p = self._map().get(tuple(key))
        return None if p is None else p[0]

    def containsKey(self, key) -> bool:
        return tuple(key) in self._map()

    def updateValue(self, key, value) -> None:
        m = self._map()
        expiry = None if self._ttl is None else self._now + self._ttl
        m[tuple(key)] = (tuple(value), expiry)
        self._store[self._name] = (_MAP, m)

    def iterator(self):
        return iter([(k, p[0]) for k, p in self._map().items()])

    def keys(self):
        return iter(list(self._map().keys()))

    def values(self):
        return iter([p[0] for p in self._map().values()])

    def removeKey(self, key) -> None:
        m = self._map()
        m.pop(tuple(key), None)
        if m:
            self._store[self._name] = (_MAP, m)
        else:
            self._store.pop(self._name, None)

    def clear(self) -> None:
        self._store.pop(self._name, None)


class ShimHandle:
    """Stand-in for ``StatefulProcessorHandle`` (value/list/map states
    with TTL + timers)."""

    def __init__(self, store: dict, now: int, timers: list | None = None) -> None:
        self._store = store
        self._now = now
        self._timers = timers  # None = timers not enabled (time_mode None)

    def getValueState(self, stateName: str, schema=None, ttlDurationMs=None):
        return ShimValueState(self._store, stateName, self._now, ttlDurationMs)

    def getListState(self, stateName: str, schema=None, ttlDurationMs=None):
        return ShimListState(self._store, stateName, self._now, ttlDurationMs)

    def getMapState(
        self, stateName: str, userKeySchema=None, valueSchema=None, ttlDurationMs=None
    ):
        return ShimMapState(self._store, stateName, self._now, ttlDurationMs)

    def deleteIfExists(self, stateName: str) -> None:
        self._store.pop(stateName, None)

    def registerTimer(self, expiryTimestampMs: int) -> None:
        # Driving caveat (ProcessingTime only): with a processing-time
        # timeout armed, the microbatch engine keeps scheduling wake-up
        # batches, so q.processAllAvailable() never returns — poll the
        # sink with a bounded deadline + a throttled trigger instead
        # (see queries/streaming_queries.streaming_session_timeout_close).
        # EventTime timers wake only on watermark change and are safe to
        # drive with processAllAvailable.
        if self._timers is None:
            raise NotImplementedError(
                "tws shim: registerTimer requires time_mode='ProcessingTime' "
                "or 'EventTime' (timers are disabled under time_mode='None', "
                "matching the native API)"
            )
        t = int(expiryTimestampMs)
        i = bisect.bisect_left(self._timers, t)
        if i == len(self._timers) or self._timers[i] != t:
            self._timers.insert(i, t)

    def deleteTimer(self, expiryTimestampMs: int) -> None:
        if self._timers is None:
            raise NotImplementedError(
                "tws shim: deleteTimer requires time_mode='ProcessingTime' "
                "or 'EventTime'"
            )
        t = int(expiryTimestampMs)
        i = bisect.bisect_left(self._timers, t)
        if i < len(self._timers) and self._timers[i] == t:
            self._timers.pop(i)

    def listTimers(self):
        if self._timers is None:
            raise NotImplementedError(
                "tws shim: listTimers requires time_mode='ProcessingTime' "
                "or 'EventTime'"
            )
        return iter(list(self._timers))


def _sweep_expired(store: dict, now: int) -> None:
    """Drop TTL-expired entries before pickling so state never carries
    dead weight across batches (the native store compacts likewise)."""
    for name in list(store):
        tag = store[name][0]
        if tag == _VALUE:
            if not _live(store[name][2], now):
                del store[name]
        elif tag == _LIST:
            live = [p for p in store[name][1] if _live(p[1], now)]
            if live:
                store[name] = (_LIST, live)
            else:
                del store[name]
        else:
            live = {k: p for k, p in store[name][1].items() if _live(p[1], now)}
            if live:
                store[name] = (_MAP, live)
            else:
                del store[name]


def transform_with_state_shim(
    df: DataFrame,
    key_cols: Sequence[str],
    processor_factory: Callable[[], object],
    output_schema: str,
    output_mode: str = "append",
    time_mode: str = "None",
) -> DataFrame:
    """Run a ``StatefulProcessor`` (built via ``processor_factory``) on
    ``applyInPandasWithState``. ``time_mode`` may be ``"None"``,
    ``"ProcessingTime"`` (processing-time timers) or ``"EventTime"``
    (watermark-driven timers; the input must carry ``withWatermark``)."""
    if time_mode not in ("None", "ProcessingTime", "EventTime"):
        raise ValueError(
            f"tws shim: unknown timeMode {time_mode!r} (expected 'None', "
            "'ProcessingTime' or 'EventTime')"
        )
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        TimerValues,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    use_timers = time_mode != "None"
    event_time = time_mode == "EventTime"

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
        clock = wm if event_time else now  # what timer expiries compare to
        proc = processor_factory()
        proc.init(ShimHandle(store, now, timers if use_timers else None))
        if not state.hasTimedOut:
            out = proc.handleInputRows(key, pdfs, tv)
            if out is not None:
                yield from out
        # end-of-batch timer firing (native order: input first, then every
        # timer expired at this batch's clock — processing time or
        # watermark — earliest first, including timers registered during
        # this very invocation)
        while timers and timers[0] <= clock:
            t = timers.pop(0)
            out = proc.handleExpiredTimer(key, tv, ExpiredTimerInfo(t))
            if out is not None:
                yield from out
        proc.close()
        _sweep_expired(store, now)
        if store or timers:
            state.update((pickle.dumps((store, timers)),))
            if timers:
                # arm the v1 single timeout to the earliest pending expiry;
                # the firing loop already drained expiries <= clock, so the
                # armed point is strictly in the clock's future as v1 needs
                if event_time:
                    state.setTimeoutTimestamp(timers[0])
                else:
                    state.setTimeoutDuration(max(1, timers[0] - now))
        elif state.exists:
            state.remove()

    timeout_conf = GroupStateTimeout.NoTimeout
    if use_timers:
        timeout_conf = (
            GroupStateTimeout.EventTimeTimeout
            if event_time
            else GroupStateTimeout.ProcessingTimeTimeout
        )
    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="s binary",
        outputMode=output_mode,
        timeoutConf=timeout_conf,
    )
