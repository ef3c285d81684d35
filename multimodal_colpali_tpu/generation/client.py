"""Async OpenAI-compatible HTTP client for the generation seam.

The framework keeps generation as a remote HTTP service exactly like the
reference (vLLM locally / api.openai.com; reference functions.py:1017-1064,
02_experiment01.py:191-225): asyncio fan-out over all prompts with a
connection-capped TCPConnector and exponential-backoff retries returning the
sentinel ``"[error] Retries FAILED [error]."`` after exhaustion.
"""

from __future__ import annotations

import asyncio
import json
import os
from typing import Any, Dict, List, Optional, Sequence

import aiohttp

ERROR_SENTINEL = "[error] Retries FAILED [error]."


async def post_request_with_retries(
    session: aiohttp.ClientSession,
    url: str,
    headers: Dict[str, str],
    data: Dict[str, Any],
    retries: int = 5,
    backoff: float = 1.0,
) -> str:
    for attempt in range(retries):
        try:
            async with session.post(url, headers=headers, json=data) as response:
                if response.status == 200:
                    response_data = await response.json()
                    choices = response_data.get("choices", [{}])
                    content = choices[0].get("message", {}).get("content")
                    # a 200 whose choices carry no message content would
                    # leak None into -> List[str] pipelines (joins,
                    # aggregators); degrade it like exhausted retries
                    return content if isinstance(content, str) \
                        else ERROR_SENTINEL
                # non-200: retry
        except (aiohttp.ClientError, asyncio.TimeoutError):
            pass
        if attempt < retries - 1:
            await asyncio.sleep(backoff * (2 ** attempt))
    return ERROR_SENTINEL


async def post_request_with_retries_raising(
    session: aiohttp.ClientSession,
    url: str,
    headers: Dict[str, str],
    data: Dict[str, Any],
    retries: int = 5,
    backoff: float = 1.0,
) -> str:
    """Raising variant (reference 02_experiment01.py:191-203)."""
    last: Optional[Exception] = None
    for attempt in range(retries):
        try:
            async with session.post(url, headers=headers, json=data) as response:
                response.raise_for_status()
                response_data = await response.json()
                return response_data["choices"][0]["message"]["content"]
        except (aiohttp.ClientError, asyncio.TimeoutError) as e:
            last = e
            if attempt < retries - 1:
                await asyncio.sleep(backoff * (2 ** attempt))
    raise RuntimeError(f"request failed after {retries} retries") from last


def resolve_endpoint(model: str, vllm_port: int = 8006,
                     base_url: Optional[str] = None) -> tuple:
    """(url, headers) for a model: OpenAI for gpt*, local vLLM otherwise.

    ``base_url`` (or $OPENAI_BASE_URL) overrides - this is also how tests
    point the client at the in-process fake server.
    """
    base = base_url or os.environ.get("OPENAI_BASE_URL")
    if base:
        url = base.rstrip("/") + "/chat/completions"
        key = os.environ.get("OPENAI_API_KEY", "EMPTY")
        return url, {"Authorization": f"Bearer {key}", "Content-Type": "application/json"}
    if model.startswith("gpt"):
        return (
            "https://api.openai.com/v1/chat/completions",
            {"Authorization": f"Bearer {os.environ.get('OPENAI_API_KEY', '')}",
             "Content-Type": "application/json"},
        )
    return (
        f"http://localhost:{vllm_port}/v1/chat/completions",
        {"Authorization": f"Bearer {os.environ.get('VLLM_API_KEY', 'EMPTY')}",
         "Content-Type": "application/json"},
    )


async def get_responses(
    model: str,
    vllm_port: int,
    processed_prompts: Sequence[List[Dict]],
    base_url: Optional[str] = None,
    connector_limit: int = 512,
    extra_body: Optional[Dict[str, Any]] = None,
) -> List[str]:
    """Fan out all prompts concurrently (reference functions.py:1036-1064)."""
    url, headers = resolve_endpoint(model, vllm_port, base_url)
    conn = aiohttp.TCPConnector(limit=connector_limit)
    async with aiohttp.ClientSession(connector=conn) as session:
        tasks = [
            post_request_with_retries(
                session, url=url, headers=headers,
                data={"model": model, "messages": msg, **(extra_body or {})},
            )
            for msg in processed_prompts
        ]
        return list(await asyncio.gather(*tasks))


async def get_response_context(
    query: str,
    context: Sequence[List[Dict]],
    model_name: str,
    url: str,
    headers: Dict[str, str],
    connector_limit: int = 512,
) -> str:
    """Two-phase ask: summarize every context prompt concurrently, then
    answer ``query`` over the joined summaries (reference
    functions.py:1684-1719).

    Behavioral deviation (intentional fix): the reference's second phase
    iterates ``for msg in fin_query`` and posts each message DICT as the
    ``messages`` field - an invalid OpenAI payload, since format_msgs
    returns one single-message list. The intended semantics (one final
    request with the full message list) are implemented instead, returning
    the answer string.
    """
    from multimodal_colpali_tpu.generation.messages import format_msgs

    conn = aiohttp.TCPConnector(limit=connector_limit)
    async with aiohttp.ClientSession(connector=conn) as session:
        tasks = [
            post_request_with_retries(
                session, url=url, headers=headers,
                data={"model": model_name, "messages": msg},
            )
            for msg in context
        ]
        responses = await asyncio.gather(*tasks)

    # A 200 response whose choices carry no message content comes back as
    # None; degrade it to the sentinel (like exhausted retries) instead of
    # letting "\n".join raise TypeError and fail the whole two-phase ask.
    summaries = [r if isinstance(r, str) else ERROR_SENTINEL
                 for r in responses]
    fin_query = format_msgs(query + "Here is context information:", [],
                            "\n".join(summaries))
    conn = aiohttp.TCPConnector(limit=connector_limit)
    async with aiohttp.ClientSession(connector=conn) as session:
        return await post_request_with_retries(
            session, url=url, headers=headers,
            data={"model": model_name, "messages": fin_query},
        )


def mcq_response_format() -> Dict[str, Any]:
    """Structured-output schema forcing {"answer": "A|B|C|D"} - the pydantic
    ``MCQ`` schema of the reference (02_experiment01.py:50-55) as a raw
    json_schema response_format."""
    return {
        "type": "json_schema",
        "json_schema": {
            "name": "MCQ",
            "schema": {
                "type": "object",
                "properties": {"answer": {"type": "string", "enum": ["A", "B", "C", "D"]}},
                "required": ["answer"],
                "additionalProperties": False,
            },
            "strict": True,
        },
    }


async def run_inference(
    model: str,
    messages_list: Sequence[List[Dict]],
    url: Optional[str] = None,
    headers: Optional[Dict[str, str]] = None,
    use_schema: bool = False,
    connector_limit: int = 512,
) -> List[str]:
    """Reference 02_experiment01.py:206-225: gather with optional MCQ schema."""
    if url is None or headers is None:
        url, headers = resolve_endpoint(model)
    body: Dict[str, Any] = {}
    if use_schema:
        body["response_format"] = mcq_response_format()
    conn = aiohttp.TCPConnector(limit=connector_limit)
    async with aiohttp.ClientSession(connector=conn) as session:
        tasks = [
            post_request_with_retries(
                session, url, headers, {"model": model, "messages": m, **body}
            )
            for m in messages_list
        ]
        return list(await asyncio.gather(*tasks))


def run_sync(coro):
    """Run an async entry point from sync code, re-entrancy safe
    (replaces the reference's nest_asyncio shims, 02_experiment01.py:336-341)."""
    try:
        loop = asyncio.get_running_loop()
    except RuntimeError:
        return asyncio.run(coro)
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
        return ex.submit(asyncio.run, coro).result()
