"""Property-based fuzz of the compaction kernel against an independent
in-Python state machine implementing the reference's merge-loop spec
(gen_query.go:395-427). Goes beyond the reference's own golden tests
(SURVEY.md §5) — any ordered interleaving of updates/erases over any
key/column set must agree."""

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aardappel_spark.compact import compact_changes
from aardappel_spark.types import CDC_EVENT_SCHEMA

KEYS = ["1", "2", "3"]
COLS = ["c1", "c2", "c3"]

event_strategy = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["update", "erase"]),
    st.dictionaries(st.sampled_from(COLS), st.one_of(st.none(), st.text("ab", max_size=2)), max_size=3),
    st.integers(min_value=0, max_value=5),  # step (small range -> collisions)
    st.integers(min_value=0, max_value=3),  # tx_id
)


def model_compact(events):
    """Reference spec: scan in (step, tx_id, seq) order; update cancels
    pending delete and merges columns; erase cancels pending upsert and
    resets columns; final op survives."""
    upsert, delete = {}, {}
    for key, op, cols, step, tx, _seq in sorted(
        events, key=lambda e: (e[3], e[4], e[5])
    ):
        if op == "update":
            delete.pop(key, None)
            merged = upsert.get(key, {})
            merged = {**merged, **cols}
            upsert[key] = merged
        else:
            upsert.pop(key, None)
            delete[key] = {}
    out = {}
    for k, cols in upsert.items():
        out[k] = ("update", cols)
    for k in delete:
        out[k] = ("erase", {})
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event_strategy, min_size=1, max_size=12))
def test_compact_matches_model(spark, events):
    rows = []
    enriched = []
    for seq, (key, op, cols, step, tx) in enumerate(events):
        cols = {} if op == "erase" else cols
        rows.append(
            (0, 0, seq, op, [key], cols, Decimal(step), Decimal(tx), seq)
        )
        enriched.append((key, op, cols, step, tx, seq))
    df = spark.createDataFrame(rows, CDC_EVENT_SCHEMA)
    got = {
        r.key[0]: (r.op, dict(r.columns))
        for r in compact_changes(df).collect()
    }
    assert got == model_compact(enriched)
