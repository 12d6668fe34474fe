"""Property-based fuzz of the wire parser against the parse.go rule set:
random well-formed and deformed messages must classify exactly as the
reference's rules dictate (exclusivity, arity, newImage preference)."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aardappel_spark.parse import (
    ERR_NOT_JSON,
    ERR_RESOLVED_ARITY,
    ERR_TS_ARITY,
    ERR_UNKNOWN_KIND,
    parse_messages,
)

cols = st.dictionaries(
    st.sampled_from(["c1", "c2"]), st.one_of(st.none(), st.integers(0, 9), st.text("xy", max_size=2)), max_size=2
)

message = st.fixed_dictionaries(
    {},
    optional={
        "update": cols,
        "erase": st.just({}),
        "newImage": cols,
        "resolved": st.lists(st.integers(0, 2**64 - 1), max_size=3),
        "key": st.lists(st.integers(0, 5), max_size=2),
        "ts": st.lists(st.integers(0, 2**64 - 1), max_size=3),
    },
)


def expected(msg: dict):
    """parse.go:25-85 as a Python model. Returns (op, error)."""
    if "resolved" in msg:
        if len(msg["resolved"]) != 2:
            return None, ERR_RESOLVED_ARITY
        return "resolved", None
    has_u, has_e = "update" in msg, "erase" in msg
    if has_u == has_e:
        # fully-empty object also parses to all-null -> not-json bucket
        if not msg:
            return None, ERR_NOT_JSON
        return None, ERR_UNKNOWN_KIND
    if len(msg.get("ts", [])) != 2:
        return None, ERR_TS_ARITY
    return ("update" if has_u else "erase"), None


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(message, min_size=1, max_size=8))
def test_parse_classification_matches_model(spark, msgs):
    df = spark.createDataFrame(
        [(0, i, json.dumps(m)) for i, m in enumerate(msgs)],
        "partition int, offset long, value string",
    )
    rows = sorted(
        parse_messages(df, table_id_col=None).collect(), key=lambda r: r.offset
    )
    for m, r in zip(msgs, rows):
        op, err = expected(m)
        assert r.error == err, (m, r)
        if err is None:
            assert r.op == op, (m, r)
            if op == "erase":
                assert r.columns == {}
            elif op == "update":
                want = m["newImage"] if m.get("newImage") else m.get("update", {})
                assert set(r.columns) == set(want), (m, r)
