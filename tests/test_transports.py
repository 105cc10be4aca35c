"""Production transport tests — fake Session injected, zero network.

Exercises the retry / timeout / error-row paths the reference hits in
production (src/eligibility.py:398-406 REST envelope,
src/predictions.py:79-130 chat-completion envelope) without ever opening
a socket: ``session_factory`` returns a scripted fake whose behavior is
keyed on the request payload, so results are deterministic across
partitioning layouts.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.operators.external import (
    RetryPolicy,
    llm_per_group,
    rest_enrich,
)
from eligibility_etl_airflow_spark.operators.transports import (
    ChatResult,
    TransportError,
    chat_completion_transport,
    chat_respond,
    count_tokens,
    rest_error_row,
    rest_transport,
)


class FakeResponse:
    def __init__(self, status: int, body: dict):
        self.status_code = status
        self._body = body

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")

    def json(self):
        return self._body


class FakeSession:
    """Scripted session: behavior keyed on the JSON payload, and a log of
    every request so tests can assert method/url/headers/timeout."""

    instances = 0

    def __init__(self, script):
        FakeSession.instances += 1
        self.script = script
        self.calls = []

    def request(self, method, url, json=None, headers=None, timeout=None):
        self.calls.append(
            {"method": method, "url": url, "json": json,
             "headers": headers, "timeout": timeout}
        )
        return self.script(json)


# --------------------------------------------------------------------------
# REST transport
# --------------------------------------------------------------------------


def test_rest_transport_success_payload_and_envelope():
    session = FakeSession(lambda body: FakeResponse(200, {"status": "ok", "k": body["k"]}))
    factory = rest_transport(
        "https://api.example.com/check",
        headers={"Content-Type": "application/fhir+json"},
        timeout_s=10.0,
        session_factory=lambda: session,
    )
    call = factory()
    out = call({"k": 7, "extra": "x"})
    assert out == {"status": "ok", "k": 7}
    req = session.calls[0]
    assert req["method"] == "POST"
    assert req["url"] == "https://api.example.com/check"
    assert req["timeout"] == 10.0
    assert req["headers"]["Content-Type"] == "application/fhir+json"
    assert req["json"] == {"k": 7, "extra": "x"}


def test_rest_transport_http_error_raises_transport_error():
    session = FakeSession(lambda body: FakeResponse(503, {}))
    call = rest_transport("https://x", session_factory=lambda: session)()
    with pytest.raises(TransportError):
        call({"k": 1})


def test_rest_transport_connection_error_raises_transport_error():
    def explode(_body):
        raise ConnectionError("refused")

    call = rest_transport("https://x", session_factory=lambda: FakeSession(explode))()
    with pytest.raises(TransportError, match="refused"):
        call({"k": 1})


def test_rest_transport_payload_and_response_mappers():
    session = FakeSession(lambda body: FakeResponse(200, {"year": 1990 + body["id"]}))
    call = rest_transport(
        "https://x",
        build_payload=lambda row: {"id": row["customer_id"]},
        parse_response=lambda row, body: {"customer_id": row["customer_id"],
                                          "issue_year": body["year"]},
        session_factory=lambda: session,
    )()
    assert call({"customer_id": 3}) == {"customer_id": 3, "issue_year": 1993}


def test_rest_transport_one_session_per_partition_many_rows():
    before = FakeSession.instances
    session_holder = []

    def make():
        s = FakeSession(lambda body: FakeResponse(200, {"ok": True}))
        session_holder.append(s)
        return s

    call = rest_transport("https://x", session_factory=make)()
    for k in range(25):
        call({"k": k})
    assert FakeSession.instances - before == 1
    assert len(session_holder[0].calls) == 25


def test_rest_transport_through_rest_enrich_error_rows(spark):
    """End-to-end: production transport inside mapInPandas, HTTP 500s
    degrade to error rows exactly like eligibility.py:405-406.

    The fake session is built from classes defined INSIDE this test:
    cloudpickle serializes function-local definitions by value, so the
    Spark workers never need to import the test module.
    """

    def scripted_rest_session():
        class Resp:
            def __init__(self, status, body):
                self.status_code, self._body = status, body

            def raise_for_status(self):
                if self.status_code >= 400:
                    raise RuntimeError(f"HTTP {self.status_code}")

            def json(self):
                return self._body

        class Sess:
            def request(self, method, url, json=None, headers=None, timeout=None):
                if json["k"] % 5 == 0:
                    return Resp(500, {})
                return Resp(200, {"k": json["k"], "status": "ok", "message": None})

        return Sess()

    df = spark.range(20).select(F.col("id").cast("long").alias("k"))
    out = rest_enrich(
        df,
        rest_transport("https://api.example.com/submit",
                       session_factory=scripted_rest_session),
        output_schema="k long, status string, message string",
        retry=RetryPolicy(attempts=2, backoff_s=0.0),
        error_row=rest_error_row,
    ).toPandas()
    assert len(out) == 20
    errs = out[out.status == "error"]
    assert set(errs.k) == {0, 5, 10, 15}
    assert errs.message.str.contains("HTTP 500").all()
    assert (out[out.k % 5 != 0].status == "ok").all()


# --------------------------------------------------------------------------
# Chat-completion transport
# --------------------------------------------------------------------------


def _chat_ok(body):
    # echo enough of the request to assert the envelope downstream
    return FakeResponse(200, {
        "choices": [{"message": {"content": '{"Rejected": {}}'}}],
        "usage": {"prompt_tokens": 11, "completion_tokens": 4},
    })


def test_chat_transport_envelope_and_usage():
    session = FakeSession(_chat_ok)
    factory = chat_completion_transport(
        "https://api.example.com/v1/chat/completions",
        model="test-model",
        api_key="sk-test",
        response_format={"type": "json_object", "schema": {"type": "object"}},
        session_factory=lambda: session,
    )
    result = factory()([{"role": "system", "content": "audit"},
                        {"role": "user", "content": "services"}])
    assert result == ChatResult(text='{"Rejected": {}}', input_tokens=11, output_tokens=4)
    req = session.calls[0]
    assert req["timeout"] == 120.0
    assert req["headers"]["Authorization"] == "Bearer sk-test"
    assert req["json"]["model"] == "test-model"
    assert req["json"]["temperature"] == 0.0
    assert req["json"]["max_tokens"] == 1500
    assert req["json"]["response_format"]["type"] == "json_object"


def test_chat_transport_usage_fallback_is_deterministic_count():
    session = FakeSession(lambda body: FakeResponse(200, {
        "choices": [{"message": {"content": "two words"}}],
    }))
    result = chat_completion_transport(
        "https://x", model="m", session_factory=lambda: session
    )()([{"role": "user", "content": "hello, world"}])
    assert result.output_tokens == count_tokens("two words") == 2
    assert result.input_tokens == count_tokens("hello, world") == 3  # hello , world


def test_chat_transport_http_error_raises():
    session = FakeSession(lambda body: FakeResponse(429, {}))
    call = chat_completion_transport("https://x", model="m",
                                     session_factory=lambda: session)()
    with pytest.raises(TransportError):
        call([{"role": "user", "content": "hi"}])


def test_count_tokens_bpe_ish():
    assert count_tokens("") == 0
    assert count_tokens(None) == 0
    assert count_tokens("abc 123 x.y") == 5  # abc / 123 / x / . / y
    assert count_tokens("  spaced   out  ") == 2


def test_chat_respond_through_llm_per_group(spark):
    """End-to-end: chat transport + chat_respond inside llm_per_group —
    HTTP failures become the failed-group marker, successes carry token
    counts through to merge_batch. Fakes are function-local for
    cloudpickle by-value serialization (see the REST test above)."""

    def flaky_chat_session():
        class Resp:
            def __init__(self, status, body):
                self.status_code, self._body = status, body

            def raise_for_status(self):
                if self.status_code >= 400:
                    raise RuntimeError(f"HTTP {self.status_code}")

            def json(self):
                return self._body

        class Sess:
            def request(self, method, url, json=None, headers=None, timeout=None):
                if "gid=2" in json["messages"][1]["content"]:
                    return Resp(500, {})  # always fails -> failed marker
                return Resp(200, {
                    "choices": [{"message": {"content": '{"label": "ok"}'}}],
                    "usage": {"prompt_tokens": 5, "completion_tokens": 3},
                })

        return Sess()

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], ["gid", "item"]
    )
    respond = chat_respond(
        chat_completion_transport("https://x", model="m",
                                  session_factory=flaky_chat_session),
        prompt="audit",
        group_messages=lambda g: [
            {"role": "system", "content": "audit"},
            {"role": "user", "content": f"gid={int(g['gid'].iloc[0])}"},
        ],
    )

    def merge_batch(batch: pd.DataFrame, parsed: pd.Series) -> pd.DataFrame:
        out = batch[["gid", "item"]].copy()
        out["status"] = [
            "failed" if m.get("__failed__") else m.get("label")
            for m in parsed
        ]
        out["in_tok"] = [int(m.get("__input_tokens__", 0)) for m in parsed]
        return out

    out = llm_per_group(
        df, "gid",
        respond=respond,
        parse=lambda text: __import__("json").loads(text),
        result_schema="gid long, item string, status string, in_tok long",
        merge_batch=merge_batch,
        retry=RetryPolicy(attempts=2, backoff_s=0.0),
    ).toPandas().sort_values(["gid", "item"]).reset_index(drop=True)

    assert list(out.status) == ["ok", "ok", "failed", "ok"]
    assert list(out.in_tok) == [5, 5, 0, 5]


def test_rest_transport_payload_bug_is_not_laundered():
    """A KeyError in the caller's build_payload must surface as itself,
    not become a TransportError error-row for every input."""
    from eligibility_etl_airflow_spark.operators import transports

    t = transports.rest_transport(
        "http://example.invalid/x",
        build_payload=lambda row: {"k": row["missing_key"]},
        session_factory=lambda: FakeSession(lambda payload: FakeResponse(200, {})),
    )
    call = t()
    with pytest.raises(KeyError):
        call({"present": 1})


# --------------------------------------------------------------------------
# stream=True: SSE accumulation (reference predictions.py:100-126 parity)
# --------------------------------------------------------------------------


class FakeStreamResponse:
    """SSE response: iter_lines yields scripted byte lines."""

    def __init__(self, status: int, lines: list[str]):
        self.status_code = status
        self._lines = lines

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")

    def iter_lines(self):
        yield from (line.encode("utf-8") for line in self._lines)


class FakeStreamSession:
    def __init__(self, response):
        self._response = response
        self.calls = []

    def request(self, method, url, json=None, headers=None, timeout=None,
                stream=False):
        self.calls.append(
            {"method": method, "url": url, "json": json,
             "headers": headers, "timeout": timeout, "stream": stream}
        )
        return self._response


def _sse(obj) -> str:
    import json as _json

    return "data: " + _json.dumps(obj)


def test_chat_transport_stream_accumulates_chunks_and_usage():
    lines = [
        _sse({"choices": [{"delta": {"role": "assistant"}}]}),
        _sse({"choices": [{"delta": {"content": '{"Reject'}}]}),
        "",  # SSE keep-alive blank line
        ": comment line",  # SSE comment, must be ignored
        _sse({"choices": [{"delta": {"content": 'ed": {}}'}}]}),
        _sse({"choices": [], "usage": {"prompt_tokens": 11, "completion_tokens": 4}}),
        "data: [DONE]",
        _sse({"choices": [{"delta": {"content": "NEVER"}}]}),  # after DONE
    ]
    session = FakeStreamSession(FakeStreamResponse(200, lines))
    result = chat_completion_transport(
        "https://x", model="m", stream=True, session_factory=lambda: session
    )()([{"role": "user", "content": "hi"}])
    # identical ChatResult contract as the non-streaming path
    assert result == ChatResult(text='{"Rejected": {}}', input_tokens=11,
                                output_tokens=4)
    req = session.calls[0]
    assert req["stream"] is True
    assert req["json"]["stream"] is True
    assert req["json"]["stream_options"] == {"include_usage": True}


def test_chat_transport_stream_usage_fallback():
    lines = [
        _sse({"choices": [{"delta": {"content": "two "}}]}),
        _sse({"choices": [{"delta": {"content": "words"}}]}),
        "data: [DONE]",
    ]
    session = FakeStreamSession(FakeStreamResponse(200, lines))
    result = chat_completion_transport(
        "https://x", model="m", stream=True, session_factory=lambda: session
    )()([{"role": "user", "content": "hello, world"}])
    assert result.text == "two words"
    assert result.output_tokens == count_tokens("two words") == 2
    assert result.input_tokens == count_tokens("hello, world") == 3


def test_chat_transport_stream_http_error_raises():
    session = FakeStreamSession(FakeStreamResponse(500, []))
    call = chat_completion_transport(
        "https://x", model="m", stream=True, session_factory=lambda: session
    )()
    with pytest.raises(TransportError):
        call([{"role": "user", "content": "hi"}])


def test_chat_transport_stream_malformed_chunk_raises():
    session = FakeStreamSession(
        FakeStreamResponse(200, ["data: {not json"])
    )
    call = chat_completion_transport(
        "https://x", model="m", stream=True, session_factory=lambda: session
    )()
    with pytest.raises(TransportError):
        call([{"role": "user", "content": "hi"}])
