"""Declared-vs-physical schema drift: the round-2 failure class.

The driver's events.parquet changed from int64-nanos to timestamp[us]
between rounds and the engine crashed (batch) / silently read NULLs
(streaming). These tests pin the fix: every loader must produce IDENTICAL
logical results from either encoding, and text formats must reconcile an
explicitly-declared physical override the same way.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.sources.table import load_table, write_table
from spark_hbase_connector_spark.streaming.events import (
    events_stream,
    run_stream_to_memory,
    tumbling_window_agg,
)

# three events rows spanning two 15-min windows; micros since epoch
_US = [1_700_000_000_000_000, 1_700_000_400_000_000, 1_700_001_000_000_000]


def _write_events(dirpath, ts_array: pa.Array) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 10, 20], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"a":1}', "{}", "{}"]),
        }
    )
    dirpath.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, str(dirpath / "events.parquet"))
    return str(dirpath)


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    """Same logical events data under three physical ts encodings."""
    base = tmp_path_factory.mktemp("events_drift")
    micros = _write_events(base / "us", pa.array(_US, pa.timestamp("us")))
    nanos_ts = _write_events(
        base / "ns", pa.array([u * 1000 for u in _US], pa.timestamp("ns"))
    )
    nanos_int = _write_events(
        base / "ns_int", pa.array([u * 1000 for u in _US], pa.int64())
    )
    return micros, nanos_ts, nanos_int


def test_batch_load_identical_across_encodings(spark, encoded_dirs):
    results = []
    for d in encoded_dirs:
        df = load(spark, d, "events")
        assert df.schema["ts"].dataType.simpleString() == "timestamp"
        rows = sorted(
            (r.event_id, r.ts.isoformat(), r.user_id, r.value)
            for r in df.collect()
        )
        assert all(r[1] is not None for r in rows)
        results.append(rows)
    assert results[0] == results[1] == results[2]


def test_streaming_load_identical_across_encodings(spark, encoded_dirs):
    results = []
    for d in encoded_dirs:
        agg = tumbling_window_agg(events_stream(spark, d))
        out = run_stream_to_memory(agg, spark, mode="complete")
        rows = sorted(
            (r.window_start.isoformat(), r.event_type, r.n, r.total_value)
            for r in out.collect()
        )
        assert rows, f"no streaming output for {d}"
        assert all(r[0] is not None for r in rows)
        results.append(rows)
    assert results[0] == results[1] == results[2]


# ------------------------------------------------------------------
# load_table declared-vs-physical reconciliation, every format
# ------------------------------------------------------------------

_DRIFT_CAT_TS = {
    "table": "drift:t",
    "rowkey": "k",
    "columns": {
        "k": {"cf": "rowkey", "col": "k", "type": "long"},
        "when": {"cf": "d", "col": "when", "type": "timestamp"},
    },
}
_DRIFT_CAT_LONG = {
    "table": "drift:t",
    "rowkey": "k",
    "columns": {
        "k": {"cf": "rowkey", "col": "k", "type": "long"},
        "when": {"cf": "d", "col": "when", "type": "bigint"},
    },
}

_EPOCH_US = 1_700_000_000_000_000
_ISO = "2023-11-14T22:13:20"


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_declared_timestamp_physical_long(spark, tmp_path, fmt):
    """Embedded-schema formats: an epoch-long file column under a declared
    timestamp reads as epoch micros (the documented contract), no crash."""
    out = str(tmp_path / f"t_{fmt}")
    df = spark.createDataFrame([(1, _EPOCH_US)], ["k", "when"])
    write_table(df, _DRIFT_CAT_LONG, out, data_format=fmt)
    back = load_table(spark, _DRIFT_CAT_TS, out, physical_naming="cf:col", data_format=fmt)
    row = back.collect()[0]
    assert back.schema["when"].dataType.simpleString() == "timestamp"
    assert row.when.isoformat() == _ISO


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_declared_long_physical_timestamp(spark, tmp_path, fmt):
    """The inverse drift (round 2's crash: TIMESTAMP_NTZ -> BIGINT cast is
    an AnalysisException): a timestamp file column under a declared bigint
    reads as epoch micros via unix_micros."""
    out = str(tmp_path / f"t_{fmt}")
    df = spark.createDataFrame([(1, _ISO)], ["k", "when"]).select(
        "k", F.to_timestamp("when").alias("when")
    )
    write_table(df, _DRIFT_CAT_TS, out, data_format=fmt)
    back = load_table(spark, _DRIFT_CAT_LONG, out, physical_naming="cf:col", data_format=fmt)
    row = back.collect()[0]
    assert back.schema["when"].dataType.simpleString() == "bigint"
    assert row.when == _EPOCH_US


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_declared_timestamp_physical_long(spark, tmp_path, fmt):
    """No embedded schema in text formats: the physical encoding is declared
    via physical_overrides and reconciled identically."""
    out = str(tmp_path / f"t_{fmt}")
    df = spark.createDataFrame([(1, _EPOCH_US)], ["k", "when"])
    write_table(df, _DRIFT_CAT_LONG, out, data_format=fmt)
    back = load_table(
        spark,
        _DRIFT_CAT_TS,
        out,
        physical_naming="cf:col",
        data_format=fmt,
        physical_overrides={"when": "bigint"},
    )
    row = back.collect()[0]
    assert back.schema["when"].dataType.simpleString() == "timestamp"
    assert row.when.isoformat() == _ISO


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_declared_long_physical_timestamp(spark, tmp_path, fmt):
    out = str(tmp_path / f"t_{fmt}")
    df = spark.createDataFrame([(1, _ISO)], ["k", "when"]).select(
        "k", F.to_timestamp("when").alias("when")
    )
    write_table(df, _DRIFT_CAT_TS, out, data_format=fmt)
    back = load_table(
        spark,
        _DRIFT_CAT_LONG,
        out,
        physical_naming="cf:col",
        data_format=fmt,
        physical_overrides={"when": "timestamp"},
    )
    row = back.collect()[0]
    assert back.schema["when"].dataType.simpleString() == "bigint"
    assert row.when == _EPOCH_US


def test_tripwire_rejects_unreconcilable_drift(spark, tmp_path):
    """A drift _adapt has no rule for (string file column under a declared
    timestamp is reconciled by CAST and yields values; but a *map* under a
    scalar cannot cast) must raise loudly, not produce a NULL column."""
    from spark_hbase_connector_spark.catalogs import _assert_declared_types

    out = str(tmp_path / "bad")
    spark.createDataFrame([(1, "oops")], ["k", "when"]).write.parquet(out)
    cat = {
        "table": "drift:t",
        "rowkey": "k",
        "columns": {
            "k": {"cf": "rowkey", "col": "k", "type": "long"},
            "when": {"cf": "d", "col": "when", "type": "bigint"},
        },
    }
    df = load_table(spark, cat, out)  # string->bigint CAST: legal, lossy->NULL
    # the post-load tripwire validates the RESOLVED schema...
    _assert_declared_types("t", cat, df)  # types match -> passes
    # ...while a type the loader cannot produce at all fails loudly
    bad = df.withColumn("when", F.lit("x"))
    with pytest.raises(TypeError, match="type drift"):
        _assert_declared_types("t", cat, bad)


def test_ts_range_predicate_pushes_through_adaptation(spark):
    """The 100 TB hot path: a time-range predicate on the ADAPTED events ts
    column must still reach the parquet scan as a pushed filter (Catalyst
    unwraps the NTZ->timestamp cast and rewrites the literal); a full scan
    here would read the whole event history."""
    from spark_hbase_connector_spark.catalogs import load

    df = load(spark, "/root/testdata/sf0.001", "events").where(
        F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan, plan


_MALFORMED_CAT = {
    "table": "t:bad",
    "rowkey": "id",
    "columns": {
        "id": {"cf": "rowkey", "col": "id", "type": "long"},
        "amount": {"cf": "d", "col": "amount", "type": "double"},
        "name": {"cf": "d", "col": "name", "type": "string"},
    },
}


def _write_bad_csv(tmp_path):
    p = tmp_path / "bad_csv"
    p.mkdir()
    (p / "part.csv").write_text(
        "id,amount,name\n"
        "1,10.5,ok\n"
        "notanumber,2.5,broken-id\n"  # id fails to parse
        "3,7.25,fine\n"
    )
    return str(p)


def _write_bad_json(tmp_path):
    p = tmp_path / "bad_json"
    p.mkdir()
    (p / "part.json").write_text(
        '{"id": 1, "amount": 10.5, "name": "ok"}\n'
        '{"id": 2, "amount": BROKEN\n'  # invalid JSON line
        '{"id": 3, "amount": 7.25, "name": "fine"}\n'
    )
    return str(p)


def test_malformed_csv_policies(spark, tmp_path):
    """permissive nulls the unparsable field, drop skips the row, fail
    raises — the explicit bad-line policy a 100 TB text ingest needs."""
    path = _write_bad_csv(tmp_path)
    perm = load_table(spark, _MALFORMED_CAT, path, data_format="csv")
    rows = {r.name: r.id for r in perm.collect()}
    assert rows == {"ok": 1, "broken-id": None, "fine": 3}

    dropped = load_table(
        spark, _MALFORMED_CAT, path, data_format="csv", on_malformed="drop"
    )
    assert {r.id for r in dropped.collect()} == {1, 3}

    import pytest as _pytest

    strict = load_table(
        spark, _MALFORMED_CAT, path, data_format="csv", on_malformed="fail"
    )
    with _pytest.raises(Exception):
        strict.collect()


def test_malformed_json_policies(spark, tmp_path):
    path = _write_bad_json(tmp_path)
    perm = load_table(spark, _MALFORMED_CAT, path, data_format="json")
    # broken line -> all-NULL row under PERMISSIVE (note: with a PRUNED
    # projection Spark may salvage fields parsed before the syntax error,
    # so assert on the full-row collect, not a pruned filter)
    got = {(r.id, r.amount) for r in perm.collect()}
    assert got == {(1, 10.5), (None, None), (3, 7.25)}

    dropped = load_table(
        spark, _MALFORMED_CAT, path, data_format="json", on_malformed="drop"
    )
    assert {r.id for r in dropped.collect()} == {1, 3}

    import pytest as _pytest

    strict = load_table(
        spark, _MALFORMED_CAT, path, data_format="json", on_malformed="fail"
    )
    with _pytest.raises(Exception):
        strict.collect()


def test_malformed_rejects_unknown_policy(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_table(
            spark, _MALFORMED_CAT, str(tmp_path), data_format="csv",
            on_malformed="explode",
        )
