"""operators/mutations.py + sources/salting.py — HBase verb/layout parity
edge cases the registry differential doesn't isolate: negative deltas,
NULL counters, append-to-absent-cell, tie determinism, salt round trips
and point-get recomputation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_hbase_connector_spark.operators.mutations import (
    apply_appends,
    apply_increments,
)
from spark_hbase_connector_spark.sources.salting import (
    add_salt,
    point_key,
    salted_prefix_predicate,
)


def test_increments_basic(spark):
    base = spark.createDataFrame(
        [(1, 10, 100), (2, None, 5), (3, 7, 7)],
        "k long, a long, b long",
    )
    incs = spark.createDataFrame(
        [(1, 1, -50), (1, 2, 10), (2, 5, 5), (4, 3, 3)],
        "k long, a long, b long",
    )
    got = {
        r.k: (r.a, r.b)
        for r in apply_increments(base, incs, "k", ["a", "b"]).collect()
    }
    assert got[1] == (13, 60)  # two increments coalesce, negative delta ok
    assert got[2] == (5, 10)  # NULL counter initializes from 0
    assert got[3] == (7, 7)  # untouched key passes through
    assert got[4] == (3, 3)  # new key created from 0
    assert len(got) == 4


def test_increments_preserves_non_counter_cols(spark):
    base = spark.createDataFrame([(1, 5, "x")], "k long, n long, tag string")
    incs = spark.createDataFrame([(1, 2)], "k long, n long")
    row = apply_increments(base, incs, "k", ["n"]).first()
    assert (row.n, row.tag) == (7, "x")


def test_increments_missing_counter_col_raises(spark):
    base = spark.createDataFrame([(1, 5)], "k long, n long")
    incs = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="lacks counter"):
        apply_increments(base, incs, "k", ["n"])


def test_appends_order_and_absent_cell(spark):
    base = spark.createDataFrame(
        [(1, "seed"), (2, None), (3, "keep")], "k long, v string"
    )
    appends = spark.createDataFrame(
        [(1, "t2", "b"), (1, "t1", "a"), (2, "t1", "new"), (4, "t1", "x")],
        "k long, ts string, v string",
    )
    got = {
        r.k: r.v
        for r in apply_appends(
            base, appends, "k", value_col="v", ts_col="ts", sep="|"
        ).collect()
    }
    assert got[1] == "seed|a|b"  # ts order, not arrival order
    assert got[2] == "new"  # append to NULL cell creates it, no leading sep
    assert got[3] == "keep"  # no appends -> untouched
    assert got[4] == "x"  # append to absent ROW creates it
    assert len(got) == 4


def test_appends_tie_break_deterministic(spark):
    base = spark.createDataFrame([(1, None)], "k long, v string")
    appends = spark.createDataFrame(
        [(1, "t", "z"), (1, "t", "a"), (1, "t", "m")], "k long, ts string, v string"
    )
    for _ in range(3):
        row = apply_appends(
            base, appends.repartition(5), "k", value_col="v", ts_col="ts"
        ).first()
        assert row.v == "amz"  # equal ts -> value order, stable across shuffles


def test_salt_deterministic_and_sortable(spark):
    df = spark.createDataFrame([(f"key{i}",) for i in range(200)], "rk string")
    a = {r.rk: r.skey for r in add_salt(df, "rk", 8).collect()}
    b = {r.rk: r.skey for r in add_salt(df, "rk", 8).collect()}
    assert a == b  # deterministic
    salts = {int(v.split("#")[0]) for v in a.values()}
    assert salts <= set(range(8)) and len(salts) > 1  # spreads buckets
    assert all(v.split("#", 1)[1] == k for k, v in a.items())  # key recoverable


def test_salt_bounds_validation(spark):
    df = spark.createDataFrame([("a",)], "rk string")
    with pytest.raises(ValueError):
        add_salt(df, "rk", 0)
    with pytest.raises(ValueError):
        add_salt(df, "rk", 101)


def test_point_key_matches_add_salt(spark):
    df = spark.createDataFrame([("hello",), ("world",)], "rk string")
    salted = {r.rk: r.skey for r in add_salt(df, "rk", 8).collect()}
    for rk, skey in salted.items():
        got = spark.range(1).select(point_key(rk, 8).alias("s")).first().s
        assert got == skey


def test_prefix_fanout_equals_unsalted_filter(spark):
    rows = [(f"user{i:03d}",) for i in range(300)]
    df = spark.createDataFrame(rows, "rk string")
    salted = add_salt(df, "rk", 8)
    got = sorted(
        r.rk
        for r in salted.where(salted_prefix_predicate("user1", 8)).collect()
    )
    exp = sorted(r.rk for r in df.where(F.col("rk").startswith("user1")).collect())
    assert got == exp and len(got) == 100


# ------------------------------------------------------ merge_rows ----


def _merge_fixtures(spark):
    from pyspark.sql import functions as F  # noqa: F811

    base = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "k long, bal double, seg string",
    )
    src = spark.createDataFrame(
        [(2, 5.0, False), (3, 7.0, True), (4, 9.0, False), (5, 1.0, None)],
        "k long, delta double, kill boolean",
    )
    return base, src


def test_merge_three_verbs(spark):
    from spark_hbase_connector_spark.operators.upsert import merge_rows
    from pyspark.sql import functions as F

    base, src = _merge_fixtures(spark)
    out = {
        r.k: (r.bal, r.seg)
        for r in merge_rows(
            base,
            src,
            "k",
            update_set={
                "bal": F.col("b.bal") + F.col("s.delta"),
                "seg": F.lit("upd"),
            },
            delete_cond=F.col("s.kill"),
            insert_values={"bal": F.col("s.delta")},
        ).collect()
    }
    assert out[1] == (10.0, "a")  # base-only untouched
    assert out[2] == (25.0, "upd")  # matched update references BOTH sides
    assert 3 not in out  # matched + delete_cond true -> deleted
    assert out[4] == (9.0, None)  # inserted; unmapped column -> NULL cell
    assert out[5] == (1.0, None)
    assert len(out) == 4


def test_merge_null_delete_cond_keeps_row(spark):
    """ANSI: a NULL verb condition means the verb does not apply."""
    from spark_hbase_connector_spark.operators.upsert import merge_rows
    from pyspark.sql import functions as F

    base = spark.createDataFrame([(1, 10.0, "a")], "k long, bal double, seg string")
    src = spark.createDataFrame([(1, 2.0, None)], "k long, delta double, kill boolean")
    out = merge_rows(
        base, src, "k",
        update_set={"bal": F.col("b.bal") + F.col("s.delta")},
        delete_cond=F.col("s.kill"),
    ).collect()
    assert len(out) == 1 and out[0].bal == 12.0  # kept AND updated


def test_merge_no_insert_clause_drops_source_only(spark):
    from spark_hbase_connector_spark.operators.upsert import merge_rows
    from pyspark.sql import functions as F

    base, src = _merge_fixtures(spark)
    out = merge_rows(
        base, src, "k", update_set={"bal": F.col("s.delta")}
    ).collect()
    assert sorted(r.k for r in out) == [1, 2, 3]  # 4,5 dropped, 3 not deleted


def test_merge_insert_cond_null_means_no_insert(spark):
    from spark_hbase_connector_spark.operators.upsert import merge_rows
    from pyspark.sql import functions as F

    base = spark.createDataFrame([(1, 10.0, "a")], "k long, bal double, seg string")
    src = spark.createDataFrame(
        [(9, 5.0, None)], "k long, delta double, kill boolean"
    )
    out = merge_rows(
        base, src, "k",
        update_set={},
        insert_values={"bal": F.col("s.delta")},
        insert_cond=F.col("s.kill"),  # NULL -> verb does not apply
    ).collect()
    assert sorted(r.k for r in out) == [1]


def test_merge_cdc_sequence_and_replay(spark, tmp_path):
    """The streaming_cdc_merge contract, isolated: sequential per-batch
    merges (insert -> tombstone -> resurrect), last-writer-wins
    composition, and idempotent replay of a crashed epoch."""
    from spark_hbase_connector_spark.operators.upsert import merge_rows
    from pyspark.sql import functions as F

    state_dir = str(tmp_path / "state")
    schema = "k long, v double"

    def apply(batch_rows):
        src = spark.createDataFrame(batch_rows, "k long, v double, typ string")
        try:
            base = spark.read.parquet(state_dir)
        except Exception:
            base = spark.createDataFrame([], schema)
        merged = merge_rows(
            base, src, "k",
            update_set={"v": F.col("s.v")},
            delete_cond=F.col("s.typ") == "del",
            insert_values={"v": F.col("s.v")},
            insert_cond=F.col("s.typ") != "del",
        ).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(state_dir)

    b1 = [(1, 1.0, "put"), (2, 2.0, "put")]
    b2 = [(1, 10.0, "put"), (2, 0.0, "del"), (3, 3.0, "put")]
    b3 = [(2, 22.0, "put")]  # tombstoned key resurrects only via new put
    for b in (b1, b2, b3):
        apply(b)
    got = {r.k: r.v for r in spark.read.parquet(state_dir).collect()}
    assert got == {1: 10.0, 2: 22.0, 3: 3.0}
    apply(b3)  # crashed-epoch replay: identical mutations, identical state
    again = {r.k: r.v for r in spark.read.parquet(state_dir).collect()}
    assert again == got


def test_merge_rejects_unknown_set_columns(spark):
    from spark_hbase_connector_spark.operators.upsert import merge_rows
    from pyspark.sql import functions as F

    base = spark.createDataFrame([(1, 1.0)], "k long, bal double")
    src = spark.createDataFrame([(1, 2.0)], "k long, delta double")
    with pytest.raises(ValueError, match="not in base"):
        merge_rows(base, src, "k", update_set={"balance": F.col("s.delta")})


# --------------------------------------------- cdc_apply_mutations ----


def test_cdc_apply_mutations_batch_split_independent(spark, tmp_path):
    """Last-writer-wins CDC apply: the final state must be a function of
    each key's globally newest mutation, independent of how mutations are
    sliced into batches AND of the order batches arrive. Exercises the
    two failure modes the naive merge has: a stale mutation in a late
    batch overwriting newer state, and a stale pre-delete mutation
    resurrecting a tombstoned key."""
    import itertools

    from spark_hbase_connector_spark.operators.upsert import cdc_apply_mutations
    from pyspark.sql import functions as F

    # (user_id, value, ts-second, event_id, event_type)
    muts = [
        (1, 1.0, 10, 100, "put"),   # k1: newest is eid 102 -> 3.0
        (1, 2.0, 20, 101, "put"),
        (1, 3.0, 30, 102, "put"),
        (2, 5.0, 10, 200, "put"),   # k2: newest is the tombstone
        (2, 6.0, 20, 201, "error"),
        (3, 7.0, 10, 300, "error"), # k3: tombstone then newer put -> 8.0
        (3, 8.0, 20, 301, "put"),
        (4, 9.0, 10, 400, "put"),   # k4: same ts, higher eid wins -> 9.5
        (4, 9.5, 10, 401, "put"),
    ]
    schema = "user_id long, value double, sec long, event_id long, event_type string"
    state_schema = (
        "user_id long, value double, ts timestamp, event_id long, deleted boolean"
    )
    expected = {1: 3.0, 3: 8.0, 4: 9.5}  # k2 tombstoned

    def run(splits):
        state = spark.createDataFrame([], state_schema)
        for batch_rows in splits:
            if not batch_rows:
                continue
            batch = spark.createDataFrame(batch_rows, schema).select(
                "user_id",
                "value",
                F.timestamp_seconds("sec").alias("ts"),
                "event_id",
                "event_type",
            )
            state = cdc_apply_mutations(state, batch).localCheckpoint(eager=True)
        return {
            r.user_id: r.value for r in state.where(~F.col("deleted")).collect()
        }

    # one batch, three chronological batches, three REVERSED batches, and
    # a pathological per-key-interleaved split delivered newest-first
    chron = [muts[0:3], muts[3:6], muts[6:9]]
    assert run([muts]) == expected
    assert run(chron) == expected
    assert run(list(reversed(chron))) == expected
    newest_first = sorted(muts, key=lambda m: (m[2], m[3]), reverse=True)
    assert run([[m] for m in newest_first]) == expected
    # exhaustive: every delivery order of the three chronological batches
    for perm in itertools.permutations(chron):
        assert run(list(perm)) == expected, perm


def test_cdc_apply_mutations_replay_idempotent(spark):
    from spark_hbase_connector_spark.operators.upsert import cdc_apply_mutations
    from pyspark.sql import functions as F

    state_schema = (
        "user_id long, value double, ts timestamp, event_id long, deleted boolean"
    )
    batch = spark.createDataFrame(
        [(1, 1.0, 10, 100, "put"), (2, 2.0, 10, 200, "error")],
        "user_id long, value double, sec long, event_id long, event_type string",
    ).select(
        "user_id", "value", F.timestamp_seconds("sec").alias("ts"),
        "event_id", "event_type",
    )
    s1 = cdc_apply_mutations(
        spark.createDataFrame([], state_schema), batch
    ).localCheckpoint(eager=True)
    s2 = cdc_apply_mutations(s1, batch).localCheckpoint(eager=True)  # replay
    rows = {(r.user_id): (r.value, r.deleted) for r in s2.collect()}
    assert rows == {1: (1.0, False), 2: (2.0, True)}  # tombstone RETAINED
