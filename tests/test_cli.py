"""CLI lifecycle tests: ``python -m aardappel_spark`` drives the same
process shape as the reference binary (cmd/aardappel/main.go) — config
load, instance lock, monitoring, stream run, graceful exit."""

import json
import os

from aardappel_spark.__main__ import main


def _write_config(tmp, src_dir, multi_instance=False):
    cfg = os.path.join(tmp, "config.yaml")
    with open(cfg, "w") as f:
        f.write(
            "\n".join(
                [
                    f"src_connection_string: {src_dir}",
                    f"instance_id: cli-test",
                    f"multiple_instances_mode: {'true' if multi_instance else 'false'}",
                    "max_expected_heartbeat_interval: 10",
                    "streams:",
                    f"  - src_topic: /topic/users",
                    f"    dst_table: {os.path.join(tmp, 'dst_users')}",
                    "    consumer: c1",
                ]
            )
            + "\n"
        )
    return cfg


def _write_metas(tmp):
    metas = os.path.join(tmp, "metas.json")
    with open(metas, "w") as f:
        json.dump(
            {
                os.path.join(tmp, "dst_users"): {
                    "primary_key": ["user_id"],
                    "columns": {"user_id": "Int64", "value": "Optional<Utf8>"},
                    "schema": "user_id bigint, value string",
                }
            },
            f,
        )
    return metas


def _write_source(tmp):
    src = os.path.join(tmp, "src")
    os.makedirs(src, exist_ok=True)

    def msg_update(uid, value, step, txid):
        return json.dumps(
            {"update": {"value": str(value)}, "key": [uid], "ts": [step, txid]}
        )

    def msg_hb(step):
        return json.dumps({"resolved": [step, 0]})

    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        for partition, offset, value in [
            (0, 1, msg_update(1, "u1", 10, 1)),
            (0, 2, msg_update(2, "u2", 20, 1)),
            (0, 3, msg_hb(100)),
        ]:
            f.write(
                json.dumps({"partition": partition, "offset": offset, "value": value})
                + "\n"
            )
    return src


def test_cli_available_now_end_to_end(spark, tmp_path, capsys):
    """--available-now drains the source, applies the quorum batch, and
    exits 0 with a stats line; the destination holds the applied rows."""
    tmp = str(tmp_path)
    src = _write_source(tmp)
    cfg = _write_config(tmp, src)
    metas = _write_metas(tmp)

    rc = main(
        [
            "--config", cfg,
            "--table-metas", metas,
            "--work-dir", os.path.join(tmp, "work"),
            "--available-now",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["state"] == "OK"
    assert stats["modifications"] == 2

    rows = {
        r.user_id: r.value
        for r in _read_dst(spark, os.path.join(tmp, "dst_users")).collect()
    }
    assert rows == {1: "u1", 2: "u2"}


def _read_dst(spark, dst_path):
    from aardappel_spark.streaming import VersionedTable
    from aardappel_spark.casting import TableMeta

    meta = TableMeta(
        "users",
        primary_key=["user_id"],
        columns={"user_id": "Int64", "value": "Optional<Utf8>"},
    )
    vt = VersionedTable(spark, dst_path, meta, "user_id bigint, value string")
    return vt.current()


def test_cli_lock_conflict_exits_standby(spark, tmp_path, capsys):
    """multiple_instances_mode + a held lock: the CLI polls as standby
    and gives up at --lock-timeout with exit code 3, touching nothing."""
    from aardappel_spark.locker import Locker, LockStorage

    tmp = str(tmp_path)
    src = _write_source(tmp)
    cfg = _write_config(tmp, src, multi_instance=True)
    metas = _write_metas(tmp)
    work = os.path.join(tmp, "work")
    os.makedirs(work, exist_ok=True)

    other = Locker(LockStorage(os.path.join(work, "lock.json")), ttl_seconds=60)
    assert other.try_acquire()

    rc = main(
        [
            "--config", cfg,
            "--table-metas", metas,
            "--work-dir", work,
            "--available-now",
            "--lock-timeout", "0",
        ]
    )
    assert rc == 3
    assert not os.path.exists(os.path.join(tmp, "dst_users"))


def test_cli_multi_stream_routes_by_table(spark, tmp_path, capsys):
    """Two streams in the config: the CLI builds the table_id-bearing
    source schema, routes per table, and gates the cut across both
    streams' partitions (--expected-partitions 2)."""
    tmp = str(tmp_path)
    src = os.path.join(tmp, "src")
    os.makedirs(src, exist_ok=True)

    def wire(table_id, partition, offset, value):
        return json.dumps(
            {"table_id": table_id, "partition": partition, "offset": offset, "value": value}
        )

    up = lambda col, val, key, step: json.dumps(
        {"update": {col: val}, "key": [key], "ts": [step, 1]}
    )
    hb = lambda step: json.dumps({"resolved": [step, 0]})
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        for line in [
            wire(0, 0, 1, up("value", "u1", 1, 10)),
            wire(1, 0, 2, up("amount", "9.99", 100, 12)),
            wire(0, 0, 3, hb(50)),
            wire(1, 0, 4, hb(50)),
        ]:
            f.write(line + "\n")

    cfg = os.path.join(tmp, "config.yaml")
    with open(cfg, "w") as f:
        f.write(
            "\n".join(
                [
                    f"src_connection_string: {src}",
                    "instance_id: cli-multi",
                    "streams:",
                    "  - src_topic: /topic/users",
                    f"    dst_table: {os.path.join(tmp, 'dst_users')}",
                    "    consumer: c1",
                    "  - src_topic: /topic/orders",
                    f"    dst_table: {os.path.join(tmp, 'dst_orders')}",
                    "    consumer: c1",
                ]
            )
            + "\n"
        )
    metas = os.path.join(tmp, "metas.json")
    with open(metas, "w") as f:
        json.dump(
            {
                os.path.join(tmp, "dst_users"): {
                    "primary_key": ["user_id"],
                    "columns": {"user_id": "Int64", "value": "Optional<Utf8>"},
                    "schema": "user_id bigint, value string",
                },
                os.path.join(tmp, "dst_orders"): {
                    "primary_key": ["order_id"],
                    "columns": {"order_id": "Int64", "amount": "Optional<Utf8>"},
                    "schema": "order_id bigint, amount string",
                },
            },
            f,
        )

    rc = main(
        [
            "--config", cfg,
            "--table-metas", metas,
            "--work-dir", os.path.join(tmp, "work"),
            "--expected-partitions", "2",
            "--available-now",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["modifications"] == 2 and stats["state"] == "OK"

    from aardappel_spark.casting import TableMeta
    from aardappel_spark.streaming import VersionedTable

    users = VersionedTable(
        spark,
        os.path.join(tmp, "dst_users"),
        TableMeta("users", ["user_id"], {"user_id": "Int64", "value": "Optional<Utf8>"}),
        "user_id bigint, value string",
    ).current()
    orders = VersionedTable(
        spark,
        os.path.join(tmp, "dst_orders"),
        TableMeta("orders", ["order_id"], {"order_id": "Int64", "amount": "Optional<Utf8>"}),
        "order_id bigint, amount string",
    ).current()
    assert {r.user_id: r.value for r in users.collect()} == {1: "u1"}
    assert {r.order_id: r.amount for r in orders.collect()} == {100: "9.99"}


def test_cli_recorded_kafka_source_end_to_end(spark, tmp_path):
    """--source-format recorded-kafka: the CLI builds the topic->table_id
    map from the config's stream order (the reference's TableId-by-index
    assignment, cmd/aardappel/main.go:204-208) and drives recorded Kafka
    record batches through run_stream end-to-end."""
    from aardappel_spark.sources import record_kafka_fixture

    tmp = str(tmp_path)
    rec = os.path.join(tmp, "recorded")

    def msg_update(uid, value, step, txid):
        return json.dumps(
            {"update": {"value": str(value)}, "key": [uid], "ts": [step, txid]}
        )

    def msg_order(oid, amount, step, txid):
        return json.dumps(
            {"update": {"amount": amount}, "key": [oid], "ts": [step, txid]}
        )

    record_kafka_fixture(
        os.path.join(rec, "batch1.jsonl"),
        [
            ("users_cdc", 0, 1, None, msg_update(1, "u1", 10, 1).encode(), 1000),
            ("orders_cdc", 0, 1, None, msg_order(100, "9.99", 12, 1).encode(), 1001),
            ("users_cdc", 0, 2, None, json.dumps({"resolved": [50, 0]}).encode(), 1002),
            ("orders_cdc", 0, 2, None, json.dumps({"resolved": [30, 0]}).encode(), 1003),
        ],
    )

    cfg = os.path.join(tmp, "config.yaml")
    with open(cfg, "w") as f:
        f.write(
            "\n".join(
                [
                    f"src_connection_string: {rec}",
                    "instance_id: cli-kafka-test",
                    "multiple_instances_mode: false",
                    "max_expected_heartbeat_interval: 10",
                    "streams:",
                    "  - src_topic: users_cdc",
                    f"    dst_table: {os.path.join(tmp, 'dst_users')}",
                    "    consumer: c1",
                    "  - src_topic: orders_cdc",
                    f"    dst_table: {os.path.join(tmp, 'dst_orders')}",
                    "    consumer: c1",
                ]
            )
            + "\n"
        )
    metas = os.path.join(tmp, "metas.json")
    with open(metas, "w") as f:
        json.dump(
            {
                os.path.join(tmp, "dst_users"): {
                    "primary_key": ["user_id"],
                    "columns": {"user_id": "Int64", "value": "Optional<Utf8>"},
                    "schema": "user_id bigint, value string",
                },
                os.path.join(tmp, "dst_orders"): {
                    "primary_key": ["order_id"],
                    "columns": {"order_id": "Int64", "amount": "Optional<Utf8>"},
                    "schema": "order_id bigint, amount string",
                },
            },
            f,
        )

    rc = main(
        [
            "--config", cfg,
            "--table-metas", metas,
            "--work-dir", os.path.join(tmp, "work"),
            "--expected-partitions", "2",
            "--available-now",
            "--source-format", "recorded-kafka",
        ]
    )
    assert rc == 0
    # quorum = min(50, 30): both step-10/12 changes applied
    users = {r.user_id: r.value for r in spark.read.schema(
        "user_id bigint, value string"
    ).parquet(os.path.join(tmp, "dst_users", "v*", "pkb=*")).collect()}
    assert users == {1: "u1"}


def test_run_query_cli_list_and_run(spark, capsys):
    """The query-runner CLI lists the registry and runs a query (JSON
    mode) against the shared session; unknown names suggest neighbors."""
    from aardappel_spark import run_query
    from aardappel_spark.registry import QUERIES

    assert run_query.main(["--list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert set(out) == set(QUERIES)

    assert (
        run_query.main(
            ["dedup_exact", "--sf-dir", "/root/testdata/sf0.001", "--json", "--limit", "3"]
        )
        == 0
    )
    captured = capsys.readouterr()
    lines = [l for l in captured.out.strip().splitlines() if l.startswith("{")]
    assert 1 <= len(lines) <= 3
    import json as _json

    row = _json.loads(lines[0])
    assert "rep_doc_id" in row and "n_copies" in row

    assert run_query.main(["dedup_exactt"]) == 2
    assert "did you mean" in capsys.readouterr().err


def test_cli_compact_and_exit(spark, tmp_path, capsys):
    """--compact-and-exit is the maintenance mode: after a normal run
    leaves multi-file buckets, it rewrites every destination to one
    file per bucket under the instance lock, reports the delta, and the
    data is unchanged."""
    from aardappel_spark.casting import TableMeta
    from aardappel_spark.streaming import VersionedTable

    tmp = str(tmp_path)
    src = _write_source(tmp)
    cfg = _write_config(tmp, src)
    metas = _write_metas(tmp)
    work = os.path.join(tmp, "work")

    rc = main(
        ["--config", cfg, "--table-metas", metas, "--work-dir", work,
         "--available-now"]
    )
    assert rc == 0
    capsys.readouterr()

    meta = TableMeta(
        "users", primary_key=["user_id"],
        columns={"user_id": "Int64", "value": "Optional<Utf8>"},
    )
    vt = VersionedTable(
        spark, os.path.join(tmp, "dst_users"), meta,
        "user_id bigint, value string",
    )
    v_before = vt.current_version()
    before = {
        r.user_id: r.value for r in vt.current().collect()
    }

    rc = main(
        ["--config", cfg, "--table-metas", metas, "--work-dir", work,
         "--compact-and-exit"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "compacted" in out

    assert vt.current_version() == v_before + 1
    after_files = vt.n_data_files()
    assert all(n == 1 for n in after_files.values()), after_files
    assert {
        r.user_id: r.value for r in vt.current().collect()
    } == before


def test_cli_setsim_dedup_mode_end_to_end(spark, tmp_path):
    """--setsim-dedup: the incremental set-similarity twin drivable from
    the CLI (r10 verdict #8) — a JSONL doc stream in, per-batch pair
    parquet out, and the emitted VERIFIED pairs equal the batch
    kernel's over the union corpus. A second drain over the same files
    plus one new doc must only emit pairs involving the new doc (the
    sets-store anti-join carries history across runs)."""
    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "pack my box with five dozen brown liquor jugs"),
        (4, "pack my box with five dozen brown liquor jugs"),
        (5, "completely unrelated words about gardening and tulips"),
    ]
    src = os.path.join(tmp_path, "docs")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        for i, text in docs:
            f.write(json.dumps({"doc_id": i, "text": text}) + "\n")
    cfg = _write_config(tmp_path, src)
    work = os.path.join(tmp_path, "work")

    rc = main([
        "--config", cfg,
        "--source-dir", src,
        "--work-dir", work,
        "--setsim-dedup",
        "--setsim-tau", "1/2",
        "--setsim-shingle", "2",
        "--available-now",
    ])
    assert rc == 0

    from aardappel_spark.ops.dedup import setsim_prefix_pairs

    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    kernel = {
        (r.id_a, r.id_b)
        for r in setsim_prefix_pairs(
            batch_df, tau_num=1, tau_den=2, shingle=2
        ).filter("verified").collect()
    }
    got = spark.read.parquet(os.path.join(work, "setsim_pairs"))
    emitted = {
        (r.id_a, r.id_b) for r in got.filter("verified").collect()
    }
    assert emitted == kernel and kernel  # fixture plants near-dups

    # run 2: same files + one new near-dup; only the new doc's pairs emit
    with open(os.path.join(src, "b2.jsonl"), "w") as f:
        f.write(json.dumps(
            {"doc_id": 6,
             "text": "the quick brown fox jumps over the lazy dog tonight"}
        ) + "\n")
    rc2 = main([
        "--config", cfg,
        "--source-dir", src,
        "--work-dir", work,
        "--setsim-dedup",
        "--setsim-tau", "1/2",
        "--setsim-shingle", "2",
        "--available-now",
        "--checkpoint", os.path.join(tmp_path, "ckpt2"),
    ])
    assert rc2 == 0
    got2 = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(os.path.join(work, "setsim_pairs"))
        .filter("verified").collect()
    }
    new_pairs = got2 - emitted
    assert new_pairs and all(6 in p for p in new_pairs)
    # r11 ADVICE (high): run 2 restarted batch ids at 0 (fresh
    # checkpoint) — without run-keyed output its batch=0 write would
    # have WIPED run 1's committed pairs. They must all survive.
    assert emitted <= got2, got2
    runs = [
        d for d in os.listdir(os.path.join(work, "setsim_pairs"))
        if d.startswith("run=")
    ]
    assert len(runs) == 2, runs


def test_cli_setsim_rejects_bad_tau_and_missing_metas(tmp_path, capsys):
    src = os.path.join(tmp_path, "docs")
    os.makedirs(src, exist_ok=True)
    cfg = _write_config(tmp_path, src)
    # CDC mode without --table-metas: clean error, not a stack trace
    assert main(["--config", cfg, "--source-dir", src]) == 2
    assert "--table-metas" in capsys.readouterr().err
    # malformed tau
    assert main([
        "--config", cfg, "--source-dir", src, "--setsim-dedup",
        "--setsim-tau", "nope", "--available-now",
    ]) == 2
    assert main([
        "--config", cfg, "--source-dir", src, "--setsim-dedup",
        "--setsim-tau", "3/2", "--available-now",
    ]) == 2


def test_cli_dedup_exact_mode_end_to_end(spark, tmp_path):
    """--dedup-exact (r11 verdict #7): the incremental exact-dedup twin
    drivable from the CLI, sharing the --setsim-dedup plumbing — a
    JSONL doc stream in, per-batch survivor parquet out, duplicates
    dropped against the persistent fingerprint store. A second drain
    over the same files plus new docs (one a dup of run 1) must emit
    only the genuinely-new doc, and run 1's survivors must survive the
    fresh-checkpoint restart (run-keyed output)."""
    docs = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),          # exact dup of 1 -> dropped
        (3, "delta epsilon zeta"),
        (4, "delta epsilon zeta"),        # exact dup of 3 -> dropped
        (5, "eta theta iota"),
    ]
    src = os.path.join(tmp_path, "docs")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        for i, text in docs:
            f.write(json.dumps({"doc_id": i, "text": text}) + "\n")
    cfg = _write_config(tmp_path, src)
    work = os.path.join(tmp_path, "work")

    rc = main([
        "--config", cfg,
        "--source-dir", src,
        "--work-dir", work,
        "--dedup-exact",
        "--available-now",
    ])
    assert rc == 0
    surv = spark.read.parquet(os.path.join(work, "dedup_survivors"))
    got1 = {r.doc_id for r in surv.collect()}
    assert got1 == {1, 3, 5}

    # run 2: same files + one dup of run 1 + one new doc, FRESH ckpt
    with open(os.path.join(src, "b2.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 6, "text": "alpha beta gamma"}) + "\n")
        f.write(json.dumps({"doc_id": 7, "text": "kappa lambda mu"}) + "\n")
    rc2 = main([
        "--config", cfg,
        "--source-dir", src,
        "--work-dir", work,
        "--dedup-exact",
        "--available-now",
        "--checkpoint", os.path.join(tmp_path, "ckpt2"),
    ])
    assert rc2 == 0
    surv2 = spark.read.parquet(os.path.join(work, "dedup_survivors"))
    got2 = {r.doc_id for r in surv2.collect()}
    # run 1's survivors intact (run-keyed: batch id restart can't wipe
    # them) + only the genuinely-new doc from run 2
    assert got2 == {1, 3, 5, 7}
    # both modes at once is a usage error
    assert main([
        "--config", cfg, "--source-dir", src, "--work-dir", work,
        "--dedup-exact", "--setsim-dedup", "--available-now",
    ]) == 2


def test_cli_lock_lost_before_query_handle_still_stops(
    spark, tmp_path, monkeypatch
):
    """r12 ADVICE (medium): if the renewal thread fires on_lost while
    the query handle is still None (a renew at ttl/2 can fail during
    slow stream startup), nothing stopped the stream back then — the
    CLI must re-check the lost flag right after assigning the handle
    and stop the query itself, or a continuous run keeps writing the
    state stores forever without provable single-writer ownership."""
    import threading

    from aardappel_spark import locker as locker_mod

    class _InstantLossRenewer:
        lost = True

        def stop(self):
            pass

    def start_renewal(self, on_lost=None):
        # simulate the race: the renewal fails BEFORE main assigns
        # lock_lost["query"] — on_lost fires against a None handle
        if on_lost is not None:
            on_lost()
        return _InstantLossRenewer()

    monkeypatch.setattr(locker_mod.Locker, "start_renewal", start_renewal)

    docs = os.path.join(tmp_path, "docs")
    os.makedirs(docs, exist_ok=True)
    with open(os.path.join(docs, "b1.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "alpha beta"}) + "\n")
    cfg = _write_config(tmp_path, docs, multi_instance=True)

    # CONTINUOUS mode (no --available-now): without the re-check the
    # stream never stops and awaitTermination blocks forever
    result = {}

    def run():
        result["rc"] = main([
            "--config", cfg,
            "--source-dir", docs,
            "--work-dir", os.path.join(tmp_path, "work"),
            "--dedup-exact",
        ])

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(120)
    assert not t.is_alive(), "stream was never stopped after lock loss"
    assert result["rc"] == 4


def test_cli_mode_conflict_checked_before_lock_acquisition(tmp_path):
    """r12 ADVICE (low): the --setsim-dedup/--dedup-exact conflict is a
    usage error that must be rejected BEFORE the instance lock is
    acquired — the old post-acquisition `return 2` left the lock held,
    blocking a standby until TTL expiry."""
    from aardappel_spark.locker import Locker, LockStorage

    docs = os.path.join(tmp_path, "docs")
    os.makedirs(docs, exist_ok=True)
    cfg = _write_config(tmp_path, docs, multi_instance=True)
    work = os.path.join(tmp_path, "work")
    rc = main([
        "--config", cfg, "--source-dir", docs, "--work-dir", work,
        "--dedup-exact", "--setsim-dedup", "--available-now",
    ])
    assert rc == 2
    # the lock was never taken: a standby acquires instantly
    other = Locker(
        LockStorage(os.path.join(work, "lock.json")), ttl_seconds=60
    )
    assert other.try_acquire()
    other.release()


def test_cli_compact_dedup_state_store(spark, tmp_path, capsys):
    """r13: --compact-and-exit combined with --dedup-exact compacts the
    streaming fingerprint store (per-batch dirs -> one file per bucket
    under batch=-1) under the instance lock, and the compacted store
    still drops duplicates on the next run."""
    docs = [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "alpha")]
    src = os.path.join(tmp_path, "docs")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        for i, text in docs:
            f.write(json.dumps({"doc_id": i, "text": text}) + "\n")
    cfg = _write_config(tmp_path, src, multi_instance=True)
    work = os.path.join(tmp_path, "work")

    assert main([
        "--config", cfg, "--source-dir", src, "--work-dir", work,
        "--dedup-exact", "--available-now",
    ]) == 0
    store = os.path.join(work, "dedup_store")
    assert any(d.startswith("batch=") and d != "batch=-1"
               for d in os.listdir(store))

    assert main([
        "--config", cfg, "--source-dir", src, "--work-dir", work,
        "--dedup-exact", "--compact-and-exit",
    ]) == 0
    out = capsys.readouterr().out
    assert "compacted dedup_store" in out
    assert [d for d in os.listdir(store) if d.startswith("batch=")] == [
        "batch=-1"
    ]
    # the lock was released by the maintenance path
    from aardappel_spark.locker import Locker, LockStorage

    other = Locker(
        LockStorage(os.path.join(work, "lock.json")), ttl_seconds=60
    )
    assert other.try_acquire()
    other.release()

    # compacted corpus still drops duplicates on the next run
    with open(os.path.join(src, "b2.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 5, "text": "beta"}) + "\n")
        f.write(json.dumps({"doc_id": 6, "text": "delta"}) + "\n")
    assert main([
        "--config", cfg, "--source-dir", src, "--work-dir", work,
        "--dedup-exact", "--available-now",
        "--checkpoint", os.path.join(tmp_path, "ckpt2"),
    ]) == 0
    surv = spark.read.parquet(os.path.join(work, "dedup_survivors"))
    assert {r.doc_id for r in surv.collect()} == {1, 2, 3, 6}
