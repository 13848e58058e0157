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
  output DataFrames straight through.

Deliberately unsupported (loud ``NotImplementedError``, not silent
drift): timers and TTL (``timeMode`` other than ``"None"``) — the v1
GroupState timeout model is per-key-single-timeout and cannot express
them faithfully. Operators using only named value states — the common
case — run identically on either engine, so one processor class carries
one verified contract across both APIs (see
``events.running_totals_tws``, oracle-checked in the registry via the
shim in this container and via the native API where protobuf exists).
"""

from __future__ import annotations

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
    """Stand-in for ``StatefulProcessorHandle`` (value states only)."""

    def __init__(self, store: dict) -> None:
        self._store = store

    def getValueState(self, name: str, schema=None, ttl_duration_ms=None):
        if ttl_duration_ms is not None:
            raise NotImplementedError(
                "tws shim: state TTL requires the native "
                "transformWithStateInPandas (google.protobuf)"
            )
        return ShimValueState(self._store, name)

    def __getattr__(self, item):  # getListState / getMapState / timers...
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
    ``applyInPandasWithState``. ``time_mode`` must be ``"None"`` — timer
    semantics are a documented non-goal of the shim."""
    if time_mode != "None":
        raise NotImplementedError(
            "tws shim: timers (timeMode != 'None') require the native "
            "transformWithStateInPandas (google.protobuf)"
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        store = pickle.loads(state.get[0]) if state.exists else {}
        proc = processor_factory()
        proc.init(ShimHandle(store))
        out = proc.handleInputRows(key, pdfs, None)
        if out is not None:
            yield from out
        proc.close()
        if store:
            state.update((pickle.dumps(store),))
        elif state.exists:
            state.remove()

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="s binary",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
