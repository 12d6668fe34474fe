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
