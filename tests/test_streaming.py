"""Streaming delivery-semantics tests (the batch-equivalence of every
streaming query is covered by the oracle differential; these cover the
sink/checkpoint contract instead)."""

from spark_hbase_connector_spark.streaming.events import events_stream

SF = "/root/testdata/sf0.001"


def test_file_sink_checkpoint_exactly_once(spark, tmp_path):
    """Checkpointed parquet sink is exactly-once across restarts: the
    first run drains the finite source and commits offsets; a second run
    over the same checkpoint must re-deliver NOTHING (no duplicate files,
    no re-appended rows). This is the production deployment shape —
    writeStream + checkpointLocation — where `run_stream_to_memory` in the
    query entries is only the test harness."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        s = events_stream(spark, SF).select("event_id", "user_id", "value")
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()
    n2 = spark.read.parquet(out).count()
    expected = spark.read.parquet(SF + "/events.parquet").count()
    assert n1 == expected
    assert n2 == expected
