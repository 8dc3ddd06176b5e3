from __future__ import annotations

from datetime import datetime, timedelta

from cdrc_semantic_search_spark.streaming import sessionize


def test_sessionize_emits_on_gap_timeout(spark, tmp_path):
    base = datetime(2026, 1, 1, 12, 0, 0)
    rows_a = [
        ("conv_a", i, "user", "x relates to y" if i == 1 else "hello", "", base + timedelta(minutes=i))
        for i in range(5)
    ]
    rows_b = [
        ("conv_b", i, "user", "hi", "", base + timedelta(minutes=i)) for i in range(3)
    ]
    # sentinel far in the future: advances the watermark past a+b timeouts
    sentinel = [("conv_z", 0, "user", "late", "", base + timedelta(hours=10))]

    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    d = tmp_path / "stream"
    spark.createDataFrame(rows_a + rows_b, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "f1"))
    spark.createDataFrame(sentinel, schema).coalesce(1).write.mode("overwrite").parquet(
        str(d / "f2")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    sessions = sessionize.sessionize_turns(stream, gap_minutes=30, watermark="10 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["conv_id"]: r for r in spark.sql("select * from sessions_out").collect()
    }
    assert "conv_a" in got and "conv_b" in got
    assert got["conv_a"]["n_turns"] == 5
    assert got["conv_a"]["n_entity_turns"] == 1
    assert got["conv_b"]["n_turns"] == 3
    assert got["conv_a"]["first_ts"] == base
    assert got["conv_a"]["last_ts"] == base + timedelta(minutes=4)
    # the sentinel conversation never timed out → not emitted
    assert "conv_z" not in got
