"""Lock (W7) and source-layer tests — scenarios from the reference's
locker_test.go:21-212 (create/steal/TTL/renew)."""

import json
import os
import time

from aardappel_spark.locker import Locker, LockStorage
from aardappel_spark.sources import read_file_batch, read_file_stream


def test_lock_acquire_and_mutual_exclusion(tmp_path):
    store = LockStorage(str(tmp_path / "lock.json"))
    a = Locker(store, ttl_seconds=60)
    b = Locker(store, ttl_seconds=60)
    assert a.try_acquire()
    assert not b.try_acquire()  # held by a
    assert a.try_acquire()  # re-entrant for the owner


def test_lock_steal_after_ttl(tmp_path):
    store = LockStorage(str(tmp_path / "lock.json"))
    a = Locker(store, ttl_seconds=0.05)
    b = Locker(store, ttl_seconds=60)
    assert a.try_acquire()
    assert not b.try_acquire()
    time.sleep(0.1)  # a's TTL expires
    assert b.try_acquire()  # stolen (locker_test.go steal scenario)
    assert not a.renew()  # a lost it; renewal must fail


def test_lock_renew_extends(tmp_path):
    store = LockStorage(str(tmp_path / "lock.json"))
    a = Locker(store, ttl_seconds=0.2)
    assert a.try_acquire()
    time.sleep(0.1)
    assert a.renew()
    time.sleep(0.15)  # past original deadline, within renewed one
    b = Locker(store, ttl_seconds=60)
    assert not b.try_acquire()


def test_lock_release(tmp_path):
    store = LockStorage(str(tmp_path / "lock.json"))
    a = Locker(store, ttl_seconds=60)
    b = Locker(store, ttl_seconds=60)
    assert a.try_acquire()
    assert a.release()
    assert b.wait_acquire(check_interval=0.01, timeout=1)


def test_file_sources(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    with open(src / "a.jsonl", "w") as f:
        f.write(json.dumps({"partition": 0, "offset": 1, "value": "{}"}) + "\n")
    batch = read_file_batch(spark, str(src))
    assert batch.count() == 1
    stream = read_file_stream(spark, str(src))
    assert stream.isStreaming
    assert [f.name for f in stream.schema.fields] == ["partition", "offset", "value"]


def test_lock_concurrent_acquisition_single_winner(tmp_path):
    """ADVICE r1: acquisition must be a real CAS — N threads racing on a
    fresh lock must produce exactly one winner."""
    import threading

    from aardappel_spark.locker import Locker, LockStorage

    path = str(tmp_path / "race.lock")
    results = []
    barrier = threading.Barrier(8)

    def contend():
        lk = Locker(LockStorage(path), ttl_seconds=30)
        barrier.wait()
        results.append(lk.try_acquire())

    threads = [threading.Thread(target=contend) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count(True) == 1


def test_lock_stale_mutex_steal_single_winner(tmp_path):
    """ADVICE r2: the stale-mutex steal must be single-winner — N threads
    all observing the same stale mutex dir race the steal, and exactly one
    may end up inside the critical section (the rmdir+mkdir steal let a
    loser rmdir the winner's freshly created mutex)."""
    import threading

    from aardappel_spark.locker import LockStorage

    path = str(tmp_path / "race.lock")
    store = LockStorage(path, mutex_ttl=0.5)
    os.mkdir(store._mutex())
    stale = time.time() - 60
    os.utime(store._mutex(), (stale, stale))

    results = []
    barrier = threading.Barrier(8)

    def contend():
        s = LockStorage(path, mutex_ttl=0.5)
        barrier.wait()
        results.append(s._enter())

    threads = [threading.Thread(target=contend) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count(True) == 1
    assert os.path.isdir(store._mutex())  # the winner holds a fresh mutex


# -- small-file compaction (maintenance.py) ----------------------------------


def test_compact_small_files_preserves_data(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from aardappel_spark.maintenance import compact_small_files, parquet_file_stats

    path = os.path.join(str(tmp_path), "t")
    # 20 tiny files
    spark.range(2000).withColumn("v", F.col("id") * 3).repartition(20).write.parquet(path)
    n_before, total = parquet_file_stats(path)
    assert n_before == 20

    before = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    n_after = compact_small_files(spark, path, target_bytes=total)  # -> 1 file
    assert n_after == 1
    assert {(r.id, r.v) for r in spark.read.parquet(path).collect()} == before
    # idempotent / already-compact: no rewrite
    assert compact_small_files(spark, path, target_bytes=total) == 1


def test_compact_small_files_clears_stale_temp(spark, tmp_path):
    import os

    from aardappel_spark.maintenance import compact_small_files

    path = os.path.join(str(tmp_path), "t")
    spark.range(100).repartition(4).write.parquet(path)
    os.makedirs(path + ".compact_tmp")  # crash leftover
    n = compact_small_files(spark, path, target_bytes=1)  # target tiny -> no-op (already >= files)
    assert not os.path.exists(path + ".compact_tmp")
    assert n == 4


def test_compact_crash_between_renames_recovers_original(spark, tmp_path):
    """ADVICE r2: a crash between `path -> .compact_old` and
    `.compact_tmp -> path` leaves the only data copies in the staging
    dirs; the next run must RESTORE .compact_old, not rmtree it."""
    import shutil

    from aardappel_spark.maintenance import compact_small_files

    path = os.path.join(str(tmp_path), "t")
    spark.range(200).repartition(4).write.parquet(path)
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    # simulate the mid-swap crash window
    shutil.copytree(path, path + ".compact_tmp")
    os.rename(path, path + ".compact_old")
    assert not os.path.exists(path)

    n = compact_small_files(spark, path, target_bytes=1)  # tiny target -> no rewrite
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == before
    assert not os.path.exists(path + ".compact_old")
    assert not os.path.exists(path + ".compact_tmp")
    assert n == 4


# -- Kafka source logic, broker-free (S1) ------------------------------------


def test_kafka_reader_options():
    from aardappel_spark.sources import kafka_reader_options

    opts = kafka_reader_options(
        "b1:9092,b2:9092", ["t1", "t2"], max_offsets_per_trigger=1000
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "t1,t2",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "1000",
    }
    assert "maxOffsetsPerTrigger" not in kafka_reader_options("b", "t")


def test_kafka_projection_on_record_schema(spark):
    """The column logic applied to Kafka's record shape (binary values,
    topic discrimination) — everything but the broker connection."""
    from aardappel_spark.sources import project_kafka_records

    rows = [
        ("orders_topic", 0, 7, bytearray(b'{"update":{}}')),
        ("users_topic", 1, 9, bytearray(b'{"erase":{}}')),
        ("stray_topic", 2, 1, bytearray(b"x")),
    ]
    df = spark.createDataFrame(
        rows, "topic string, partition int, offset long, value binary"
    )
    out = project_kafka_records(df, {"orders_topic": 0, "users_topic": 1}).collect()
    got = {(r.table_id, r.partition, r.offset, r.value) for r in out}
    assert got == {
        (0, 0, 7, '{"update":{}}'),
        (1, 1, 9, '{"erase":{}}'),
        (None, 2, 1, "x"),  # unmapped topic -> null table id
    }
    # without a mapping, no table_id column at all
    assert "table_id" not in project_kafka_records(df).columns


def test_ts_unit_guard_rejects_micros(spark, tmp_path):
    """ADVICE r3: an int64 ts column holding epoch-MICROS must fail loudly
    instead of flowing through load_events_ns 1000x too small."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from aardappel_spark.sources import load_events_ns

    micros_2024 = 1_704_067_207_179_575  # ~2024-01-01 in epoch-micros
    nanos_2024 = micros_2024 * 1000

    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([micros_2024, micros_2024 + 5], pa.int64()),
                  "event_id": pa.array([1, 2], pa.int64())}),
        str(bad / "events.parquet"),
    )
    with pytest.raises(ValueError, match="not.*epoch-nanoseconds"):
        load_events_ns(spark, str(bad))

    good = tmp_path / "good"
    good.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([nanos_2024, nanos_2024 + 5000], pa.int64()),
                  "event_id": pa.array([1, 2], pa.int64())}),
        str(good / "events.parquet"),
    )
    assert load_events_ns(spark, str(good)).count() == 2


def test_ts_unit_guard_handles_directory_datasets(spark, tmp_path):
    """ADVICE r4: a Spark-written DIRECTORY dataset (part files) with an
    int64 ts column must be validated (not crash with IsADirectoryError)
    — bad units still rejected, good units still load."""
    import pytest

    from aardappel_spark.sources import load_events_ns

    micros_2024 = 1_704_067_207_179_575
    nanos_2024 = micros_2024 * 1000

    bad = tmp_path / "bad"
    spark.createDataFrame(
        [(micros_2024, 1), (micros_2024 + 5, 2)], "ts long, event_id long"
    ).repartition(2).write.parquet(str(bad / "events.parquet"))
    with pytest.raises(ValueError, match="not.*epoch-nanoseconds"):
        load_events_ns(spark, str(bad))

    good = tmp_path / "good"
    spark.createDataFrame(
        [(nanos_2024, 1), (nanos_2024 + 5000, 2)], "ts long, event_id long"
    ).repartition(2).write.parquet(str(good / "events.parquet"))
    assert load_events_ns(spark, str(good)).count() == 2


def test_lock_renewal_thread_keeps_lock_beyond_ttl(tmp_path):
    """r11 ADVICE (medium): without a renewal thread any holder
    running longer than one TTL silently loses the lock to a standby —
    two concurrent writers. The half-TTL renewer (locker_thread.go)
    must keep the lock held indefinitely, and stopping it must let the
    lock expire normally."""
    path = str(tmp_path / "lock.json")
    a = Locker(LockStorage(path), ttl_seconds=0.6)
    assert a.try_acquire()
    renewer = a.start_renewal()
    b = Locker(LockStorage(path), ttl_seconds=0.6)
    deadline = time.time() + 1.8  # 3x TTL: unrenewed, b would win
    while time.time() < deadline:
        assert not b.try_acquire(), "renewed lock was stolen"
        time.sleep(0.15)
    assert not renewer.lost
    renewer.stop()
    time.sleep(1.0)  # > TTL after the last renewal
    assert b.try_acquire()


def test_lock_renewal_fires_on_lost_and_stops_writing(tmp_path):
    """A failed renew means the lock was stolen: the renewer must fire
    on_lost exactly once, flip .lost, and exit — the holder's callback
    is what stops the stream."""
    path = str(tmp_path / "lock.json")
    a = Locker(LockStorage(path), ttl_seconds=0.4)
    assert a.try_acquire()
    events = []
    renewer = a.start_renewal(on_lost=lambda: events.append("lost"))
    # simulate a steal: another owner overwrites the lock row directly
    with open(path, "w") as f:
        json.dump(
            {"lock_owner": "lock_intruder", "lock_deadline": time.time() + 99},
            f,
        )
    deadline = time.time() + 3.0
    while not renewer.lost and time.time() < deadline:
        time.sleep(0.05)
    assert renewer.lost and events == ["lost"]
    time.sleep(0.5)  # the thread exited; on_lost never fires again
    assert events == ["lost"]
    renewer.stop()  # idempotent after self-exit


def test_scale_probe_flush_merges_never_clobbers(tmp_path, monkeypatch):
    """r11 verdict #6: a SCALE_PROBE_ONLY subset run (or an aborted
    full run) flushing partial results must MERGE into the committed
    artifact — committed rows, and committed keys within a re-probed
    row, provably survive."""
    import tools.scale_probe as sp

    art = tmp_path / "SCALE_PROBE.json"
    committed = {
        "n": 10,
        "x_big": 100,
        "queries": {
            "tpch_q1": {"t_x1_sec": 1.0, "t_x10_sec": 9.0, "ratio": 9.0,
                        "t_x100_dialed_sec": 80.0},
            "cdc_apply": {"t_x1_sec": 0.5, "t_x10_sec": 4.0},
        },
    }
    art.write_text(json.dumps(committed))

    def fake_path(*parts):
        return str(art)

    monkeypatch.setattr(
        sp.os.path, "join",
        lambda *p: str(art) if p and p[-1] == "SCALE_PROBE.json"
        else os.path.join(*p),
    )
    # subset run: re-probes ONLY tpch_q1's x10 legs, nothing else
    sp._flush_results(
        {"n": 10, "queries": {"tpch_q1": {"t_x1_sec": 1.1,
                                          "t_x10_sec": 9.5, "ratio": 8.6}}}
    )
    merged = json.loads(art.read_text())
    # the un-probed committed row survives untouched
    assert merged["queries"]["cdc_apply"] == committed["queries"]["cdc_apply"]
    # the re-probed row keeps its committed dialed leg and takes the
    # fresh x10 measurements
    q1 = merged["queries"]["tpch_q1"]
    assert q1["t_x100_dialed_sec"] == 80.0 and q1["t_x10_sec"] == 9.5
    # committed TOP-LEVEL keys this run didn't produce survive too —
    # "x_big" from a prior full run must not be dropped by a subset
    # run (r12 ADVICE: same clobber class as the query rows)
    assert merged["x_big"] == 100 and merged["n"] == 10
