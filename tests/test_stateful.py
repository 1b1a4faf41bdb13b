"""applyInPandasWithState: per-key bounded state across micro-batches.

Streams a file source one file per trigger through running_user_totals
and checks the final per-user totals equal the batch groupBy — state
carries correctly across batches and keys never interfere.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from change_data_capture_poc_spark.streaming.stateful import running_user_totals


def test_running_totals_across_batches(spark, tmp_path):
    rows = [
        (uid, sec, float(v))
        for uid, sec, v in [
            (1, 10, 5), (1, 20, 7), (2, 15, 1),
            (1, 30, 2), (2, 40, 3), (3, 50, 9),
        ]
    ]
    # Three chunk files -> three micro-batches.
    src = str(tmp_path / "src")
    os.makedirs(src)
    for c in range(3):
        chunk = rows[c * 2:(c + 1) * 2]
        with open(os.path.join(src, f"c{c}.json"), "w") as f:
            for uid, sec, v in chunk:
                f.write(f'{{"user_id": {uid}, "sec": {sec}, "value": {v}}}\n')

    stream = (
        spark.readStream.schema("user_id long, sec long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select("user_id", F.timestamp_seconds("sec").alias("ts"), "value")
    )
    out_rows = []

    def collect_batch(df, _bid):
        out_rows.extend(df.collect())

    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # assert the drain FINISHED — on timeout awaitTermination returns
    # False and out_rows would be read while batches are in flight.
    assert q.awaitTermination(300)

    # Last emitted row per user is the running total after its final batch.
    final = {}
    for r in out_rows:
        final[r.user_id] = r
    assert final[1].n == 3 and final[1].value_sum == 14.0
    assert final[2].n == 2 and final[2].value_sum == 4.0
    assert final[3].n == 1 and final[3].value_sum == 9.0
    assert final[1].last_ts.second == 30
