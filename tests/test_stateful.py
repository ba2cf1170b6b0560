"""Stateful streaming operator tests — state carries across micro-batches."""

from pyspark.sql import functions as F

from bdq_spark.streaming.stateful import running_counter


def test_running_counter_batch_matches_groupby(spark):
    ev = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (2, 7.0), (2, 1.0)],
        "user_id:long, value:double",
    )
    got = {r.key: (r.n_events, r.total, r.max_value)
           for r in running_counter(ev).collect()}
    assert got == {1: (2, 30.0, 20.0), 2: (3, 13.0, 7.0)}


def test_running_counter_streaming_state_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def emit(name, rows):
        spark.createDataFrame(rows, "user_id:long, value:double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    emit("b1", [(1, 10.0), (2, 5.0)])

    stream = spark.readStream.schema("user_id long, value double").parquet(
        f"{src}/*"
    )
    out = running_counter(stream)
    assert out.isStreaming

    spark.sql("DROP TABLE IF EXISTS rc_sink")
    collected = []

    def run_available():
        # memory sink cannot recover from a checkpoint; foreachBatch can
        def sink(batch_df, batch_id):
            collected.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(90)

    run_available()
    first = {r.key: (r.n_events, r.total) for r in collected}
    assert first == {1: (1, 10.0), 2: (1, 5.0)}

    # second batch: state must ACCUMULATE, not reset
    emit("b2", [(1, 30.0), (3, 2.0)])
    collected.clear()
    run_available()
    second = {r.key: (r.n_events, r.total, r.max_value) for r in collected}
    # update mode emits only touched keys; user 1 carries state forward
    assert second[1] == (2, 40.0, 30.0)
    assert second[3] == (1, 2.0, 2.0)
    assert 2 not in second  # untouched key not re-emitted in update mode
