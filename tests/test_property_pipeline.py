"""Property-based golden test (SURVEY.md §5.2(2)+(3)): arbitrary record
batches — random unicode messages, random event counts (including
zero), all three routing kinds in random order — must route and
transform byte-identically to an independent pure-Python model of the
reference's documented semantics (lambda/main.py:55-98)."""

from __future__ import annotations

import base64
import gzip
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ex_aws_firehose_spark.operators.firehose import decode_chain, route

RECORDS_SCHEMA = "idx long, record_id string, data string"

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)

_event = st.fixed_dictionaries(
    {
        "id": _text,
        "timestamp": st.integers(min_value=0, max_value=2**40),
        "message": _text,
    }
)

_record_kind = st.one_of(
    st.tuples(st.just("data"), st.lists(_event, max_size=4)),
    st.tuples(st.just("control"), st.none()),
    st.tuples(st.just("bare"), _text),
)


def _encode(payload: object) -> str:
    return base64.b64encode(gzip.compress(json.dumps(payload).encode())).decode()


def _model(kind: str, detail) -> tuple[str, str | None]:
    """Pure-Python reference model: (result, payload)."""
    if kind == "bare":
        return "Ok", detail
    if kind == "control":
        return "ProcessingFailed", None
    return "Ok", "".join(
        ev["message"].replace("Hello", "Hell Yeah") + "\n" for ev in detail
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(_record_kind, min_size=1, max_size=6))
def test_route_matches_python_model(spark, batch):
    rows, expected = [], {}
    for i, (kind, detail) in enumerate(batch):
        rid = f"rec-{i}"
        if kind == "data":
            env = {
                "messageType": "DATA_MESSAGE",
                "owner": "o",
                "logGroup": "g",
                "logStream": "s",
                "subscriptionFilters": [],
                "logEvents": detail,
            }
            rows.append((i, rid, _encode(env)))
        elif kind == "control":
            env = {
                "messageType": "CONTROL_MESSAGE",
                "owner": "o",
                "logGroup": "g",
                "logStream": "s",
                "subscriptionFilters": [],
                "logEvents": [],
            }
            rows.append((i, rid, _encode(env)))
        else:
            rows.append((i, rid, _encode(detail)))
        expected[rid] = _model(kind, detail)

    df = spark.createDataFrame(rows, RECORDS_SCHEMA)
    got = {
        r["record_id"]: (r["result"], r["payload"])
        for r in route(decode_chain(df)).collect()
    }
    assert got == expected
