"""Production HTTP transports for the external-call seam (SURVEY.md §2.1
S9-S11).

``rest_enrich`` / ``llm_per_group`` (operators/external.py) take injected
transports; the test suite injects deterministic mocks. This module is the
*production* half: a ``requests``-based REST transport and an OpenAI-style
chat-completion transport, with the reference's timeout/error envelope —

- REST: ``requests.post(url, json=..., timeout=10)`` +
  ``raise_for_status`` with request failures degraded to error *rows*
  rather than task failures (reference src/eligibility.py:398-406).
- LLM: chat-completion POST with ``temperature=0.0``, bounded
  ``max_tokens``, a 120 s timeout, JSON-schema ``response_format``, and
  input/output token accounting (reference src/predictions.py:79-130 and
  its `ChatFireworks(..., request_timeout=(120,120))` envelope;
  BASELINE.md timeout table).

Endpoints and credentials are ARGUMENTS — nothing is read from the
environment and no default host exists. ``session_factory`` is injectable
so the unit tests exercise the retry/timeout/error paths with a fake
session and zero network; production simply omits it and gets a pooled
``requests.Session`` per executor partition (connection reuse — the whole
point of the per-partition ``transport_factory`` contract).

Production wiring (one partition-scoped session per task)::

    from eligibility_etl_airflow_spark.operators import transports, external

    out = external.rest_enrich(
        df,
        transports.rest_transport("https://api.example.com/eligibility",
                                  headers={"Content-Type": "application/fhir+json"}),
        output_schema="iqama string, status string, message string",
    )

    respond = transports.chat_respond(
        transports.chat_completion_transport(
            "https://api.example.com/v1/chat/completions",
            model="my-model", api_key="..."),
        prompt="You are a claims auditor...",
    )
    preds = external.llm_per_group(df, "visit_id", respond, parse, schema, merge)
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd

try:  # import-gated like the Excel shim: the engine never requires requests
    import requests as _requests
except ImportError:  # pragma: no cover - requests is present in CI
    _requests = None


class TransportError(RuntimeError):
    """A transport-level failure (HTTP error, timeout, bad payload).

    Raised so the caller's RetryPolicy / error_row ladder in
    operators/external.py decides the row's fate — the transport itself
    never swallows failures silently.
    """


def _default_session_factory():
    if _requests is None:  # pragma: no cover
        raise ImportError(
            "requests is not installed; pass session_factory= explicitly "
            "or install requests for the production transports"
        )
    return _requests.Session()


# BPE-ish pre-tokenizer (same shape as operators/text.py's JVM regex):
# letter runs, digit runs, single punctuation. Used when the server omits
# a usage block — a deterministic stand-in for the reference's tiktoken
# count (src/predictions.py:108-110 count_tokens).
_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def count_tokens(text: str) -> int:
    """Deterministic approximate token count (BPE-ish pre-tokenizer)."""
    return len(_TOKEN_RE.findall(text or ""))


# --------------------------------------------------------------------------
# S9/S10 — REST enrichment transport
# --------------------------------------------------------------------------


def rest_transport(
    url: str,
    *,
    method: str = "POST",
    headers: dict[str, str] | None = None,
    timeout_s: float = 10.0,
    build_payload: Callable[[dict], dict] | None = None,
    parse_response: Callable[[dict, dict], dict] | None = None,
    session_factory: Callable[[], object] | None = None,
) -> Callable[[], Callable[[dict], dict]]:
    """A ``transport_factory`` for :func:`external.rest_enrich`.

    Called once per partition; opens ONE pooled session and returns the
    row-level callable. Per row: ``build_payload(row)`` (default: the row
    itself) is sent as JSON; non-2xx / timeout / connection errors raise
    :class:`TransportError` so ``rest_enrich``'s retry + error-row ladder
    applies (parity with src/eligibility.py:398-406, where a
    RequestException becomes ``{"status": "error", "message": ...}``).

    ``parse_response(row, body)`` maps the decoded JSON body to the output
    row (default: the body itself).
    """
    make_session = session_factory or _default_session_factory
    to_payload = build_payload or (lambda row: row)
    from_body = parse_response or (lambda row, body: body)

    def factory() -> Callable[[dict], dict]:
        session = make_session()

        def call(row: dict) -> dict:
            # payload construction runs OUTSIDE the transport try: a bug
            # in the caller's build_payload (KeyError on a missing field)
            # must surface as itself, not be laundered into TransportError
            # and silently degraded into an error row for every input
            payload = to_payload(row)
            try:
                resp = session.request(
                    method, url, json=payload,
                    headers=headers, timeout=timeout_s,
                )
                resp.raise_for_status()
                body = resp.json()
            except Exception as exc:
                raise TransportError(str(exc)) from exc
            return from_body(row, body)

        return call

    return factory


def rest_error_row(row: dict, exc: Exception) -> dict:
    """The reference's error-row shape (eligibility.py:405-406): keep the
    input keys, mark status/message. Pass as ``error_row=`` to
    ``rest_enrich`` alongside :func:`rest_transport`."""
    return {**row, "status": "error", "message": str(exc)}


# --------------------------------------------------------------------------
# S11 — chat-completion (OpenAI-style) LLM transport
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ChatResult:
    """One LLM call's outcome: text + token accounting (A9, SURVEY §2.5).

    Mirrors the reference's ``dev_response`` return
    (src/predictions.py:125-127: elapsed, text, input_tokens,
    output_tokens) minus wall-clock, which is non-deterministic and
    measured by the bench harness instead.
    """

    text: str
    input_tokens: int
    output_tokens: int


def _accumulate_sse_stream(resp) -> tuple[str, dict]:
    """Accumulate an OpenAI-style SSE chat stream into (text, usage).

    Parses ``data: {json}`` lines, concatenates every chunk's
    ``choices[0].delta.content``, stops at ``data: [DONE]``, and captures
    the ``usage`` block servers send on the final chunk when the request
    asked for ``stream_options.include_usage`` — the same
    accumulate-chunks contract as the reference's streaming path
    (src/predictions.py:100-126, where ``for chunk in llm.stream(...)``
    concatenates ``chunk.content``)."""
    parts: list[str] = []
    usage: dict = {}
    try:
        for raw in resp.iter_lines():
            if not raw:
                continue
            line = raw.decode("utf-8") if isinstance(raw, bytes) else raw
            if not line.startswith("data:"):
                continue  # SSE comments / event fields
            data = line[len("data:"):].strip()
            if data == "[DONE]":
                break
            chunk = json.loads(data)
            if chunk.get("usage"):
                usage = chunk["usage"]
            choices = chunk.get("choices") or []
            if choices:
                delta = choices[0].get("delta") or {}
                content = delta.get("content")
                if content:
                    parts.append(content)
    finally:
        # breaking out at [DONE] abandons the response mid-iteration;
        # without an explicit close the connection never returns to the
        # session pool and long-lived executors leak one socket per call
        close = getattr(resp, "close", None)
        if close is not None:
            close()
    return "".join(parts), usage


def chat_completion_transport(
    url: str,
    *,
    model: str,
    api_key: str | None = None,
    temperature: float = 0.0,
    max_tokens: int = 1500,
    timeout_s: float = 120.0,
    response_format: dict | None = None,
    extra_headers: dict[str, str] | None = None,
    stream: bool = False,
    session_factory: Callable[[], object] | None = None,
) -> Callable[[], Callable[[list[dict]], ChatResult]]:
    """A per-partition factory of ``messages -> ChatResult`` callables.

    POSTs the OpenAI-compatible ``/chat/completions`` body (``model``,
    ``messages``, ``temperature=0.0``, ``max_tokens``, optional
    ``response_format`` for schema-constrained JSON — parity with the
    reference's ``bind(response_format={"type": "json_object", "schema":
    ...})``, src/predictions.py:95-100) and returns the first choice's
    content plus token usage. Server-reported ``usage`` wins; when absent
    the deterministic :func:`count_tokens` fallback is used (parity with
    count_tokens over prompt+response, src/predictions.py:108-123).

    ``stream=True`` switches to the reference's Fireworks-style streaming
    accumulation (src/predictions.py:100-126): the body carries
    ``stream: true`` plus ``stream_options.include_usage``, SSE chunks
    are concatenated into the final text, and the last chunk's ``usage``
    block feeds the same token contract — identical ``ChatResult`` either
    way, so ``llm_per_group`` callers never see the difference.

    HTTP failures raise :class:`TransportError`; ``llm_per_group``'s
    RetryPolicy then drives the failed-group second pass.
    """
    make_session = session_factory or _default_session_factory
    headers = {"Content-Type": "application/json", **(extra_headers or {})}
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"

    def factory() -> Callable[[list[dict]], ChatResult]:
        session = make_session()

        def call(messages: list[dict]) -> ChatResult:
            body = {
                "model": model,
                "messages": messages,
                "temperature": temperature,
                "max_tokens": max_tokens,
            }
            if response_format is not None:
                body["response_format"] = response_format
            if stream:
                body["stream"] = True
                body["stream_options"] = {"include_usage": True}
            try:
                if stream:
                    resp = session.request(
                        "POST", url, json=body, headers=headers,
                        timeout=timeout_s, stream=True,
                    )
                    resp.raise_for_status()
                    text, usage = _accumulate_sse_stream(resp)
                else:
                    resp = session.request(
                        "POST", url, json=body, headers=headers, timeout=timeout_s
                    )
                    resp.raise_for_status()
                    payload = resp.json()
                    text = payload["choices"][0]["message"]["content"]
                    usage = payload.get("usage") or {}
            except Exception as exc:
                raise TransportError(str(exc)) from exc
            in_tok = usage.get("prompt_tokens")
            out_tok = usage.get("completion_tokens")
            if in_tok is None:
                in_tok = sum(count_tokens(str(m.get("content", ""))) for m in messages)
            if out_tok is None:
                out_tok = count_tokens(text)
            return ChatResult(text=text, input_tokens=int(in_tok), output_tokens=int(out_tok))

        return call

    return factory


def chat_respond(
    transport_factory: Callable[[], Callable[[list[dict]], ChatResult]],
    prompt: str,
    *,
    group_messages: Callable[[pd.DataFrame], list[dict]] | None = None,
) -> Callable[[pd.DataFrame], ChatResult]:
    """Adapt a chat transport to ``llm_per_group``'s ``respond(group)``.

    Builds the reference's message shape (system prompt + the group's
    rows as the human turn, src/predictions.py:102-106) unless
    ``group_messages`` overrides it. The transport is created lazily on
    first call so the session lives on the executor, not the driver.
    """
    state: dict = {}

    def default_messages(group: pd.DataFrame) -> list[dict]:
        return [
            {"role": "system", "content": prompt},
            {"role": "user", "content": "Ordered Services: "
             + json.dumps(group.to_dict("records"), default=str)},
        ]

    build = group_messages or default_messages

    def respond(group: pd.DataFrame) -> ChatResult:
        if "call" not in state:
            state["call"] = transport_factory()
        return state["call"](build(group))

    return respond
