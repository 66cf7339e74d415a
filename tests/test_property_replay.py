"""Property-based replay equivalence (hypothesis): for ANY event sequence
and ANY batch partitioning of it, the merged table equals the
latest-lsn-wins / delete-wins replay computed independently in Python.

This is the engine's core invariant (north rule: "matching the reference's
final table state after replay under exactly-once rules") checked against
randomized inputs instead of fixtures: duplicate lsns across ops, multiple
updates per key, deletes-then-reinserts, batches cut at arbitrary points.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA

from tests.util import ev, mk_events


# events: each is (op, conv, turn); lsn = position+1 (unique, total order)
_events = st.lists(
    st.tuples(
        st.sampled_from(["c", "u", "d"]),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=2),
    ),
    min_size=1,
    max_size=24,
)
_cuts = st.lists(st.integers(min_value=1, max_value=23), max_size=2, unique=True)


def _python_replay(rows):
    """Independent oracle: latest lsn wins; delete-wins on (impossible
    here) ties; deleted keys absent."""
    state = {}
    for lsn, op, conv, turn, text in rows:
        state[(conv, turn)] = (lsn, op, text)
    return {
        k: v[2] for k, v in state.items() if v[1] != "d"
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=_events, cuts=_cuts)
def test_any_batching_matches_python_replay(spark, tmp_path_factory, events, cuts):
    rows = [
        (i + 1, op, conv, turn, f"t{i + 1}" if op != "d" else None)
        for i, (op, conv, turn) in enumerate(events)
    ]
    expected = _python_replay(rows)

    d = tmp_path_factory.mktemp("prop")
    t = LakeTable.create(spark, str(d / "tbl"), TRANSCRIPT_SCHEMA, num_buckets=2)
    bounds = sorted({c for c in cuts if c < len(rows)} | {len(rows)})
    lo = 0
    for batch_id, hi in enumerate(bounds):
        batch = [
            ev(lsn, op, conv, turn, text=text)
            for lsn, op, conv, turn, text in rows[lo:hi]
        ]
        if batch:
            t.merge(mk_events(spark, batch), batch_id=batch_id)
        lo = hi

    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read().select("conv_id", "turn_idx", "text").collect()
    }
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=_events)
def test_json_envelope_roundtrip_matches_python_replay(
    spark, tmp_path_factory, events
):
    """For ANY event sequence, packing the payload into the raw JSON
    envelope and running it through JsonCdcIngestJob's inference +
    extraction + merge stage yields the same final state as the Python
    replay — the typed and raw paths are interchangeable."""
    from airbyte_custom_spark.sources.generator import json_envelope
    from airbyte_custom_spark.streaming.pipeline import JsonCdcIngestJob

    rows = [
        (i + 1, op, conv, turn, f"t{i + 1}" if op != "d" else None)
        for i, (op, conv, turn) in enumerate(events)
    ]
    expected = _python_replay(rows)

    d = tmp_path_factory.mktemp("jprop")
    t = LakeTable.create(spark, str(d / "tbl"), TRANSCRIPT_SCHEMA, num_buckets=2)
    job = JsonCdcIngestJob(spark, t.path, str(d / "src"), str(d / "ckpt"))
    enveloped = json_envelope(
        mk_events(spark, [ev(l, op, c, tn, text=tx) for l, op, c, tn, tx in rows])
    )
    t.merge(job._transform_batch(enveloped, t), batch_id=0)

    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read().select("conv_id", "turn_idx", "text").collect()
    }
    assert got == expected
