"""applyInPandasWithState operator: state must persist across micro-batches."""

import json
import os


def write_batch(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for key, value, step, tx in rows:
            f.write(json.dumps({"key": key, "value": value, "step": step, "tx_id": tx}) + "\n")


def run_stream(spark, src, ckpt, out_dir):
    from aardappel_spark.stateful import streaming_lww

    stream = spark.readStream.schema("key string, value string, step long, tx_id long").json(src)
    q = (
        streaming_lww(stream)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_lww_state_persists_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    write_batch(src, "b1.jsonl", [("a", "v1", 1, 1), ("a", "v2", 2, 1), ("b", "x", 5, 1)])
    run_stream(spark, src, ckpt, out)

    rows = {r.key: r for r in spark.read.parquet(out).collect()}
    assert rows["a"].value == "v2" and rows["a"].n_changes == 2
    assert rows["b"].value == "x"

    # second batch: an OLDER change for 'a' must NOT win; counter continues
    write_batch(src, "b2.jsonl", [("a", "stale", 1, 0, ), ("b", "y", 9, 1)])
    run_stream(spark, src, ckpt, out)
    latest = {}
    for r in spark.read.parquet(out).collect():
        cur = latest.get(r.key)
        if cur is None or (r.step, r.tx_id, r.n_changes) >= (cur.step, cur.tx_id, cur.n_changes):
            latest[r.key] = r
    assert latest["a"].value == "v2"  # stale change lost
    assert latest["a"].n_changes == 3  # but was counted
    assert latest["b"].value == "y"
