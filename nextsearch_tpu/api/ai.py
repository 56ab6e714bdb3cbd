"""AI overview / summary proxy (Azure OpenAI chat completions).

Host-side module with behavioral parity to src/api_ai_overview.cpp and
src/api_ai_summary.cpp: same prompts, request shape (max_completion_tokens
1000/500), cache keys ("query|k" / "summary|cord_uid"), cache-hit stat
semantics, quota decrement for unauthorized callers, and error mapping.

The HTTPS POST goes through a pluggable `transport` callable
(host, path, headers, body) -> response body string, defaulting to
http.client; tests inject a fake transport.
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field
from typing import Callable, Optional

from ..utils.logging import log

Transport = Callable[[str, str, dict, str], str]


@dataclass
class AzureOpenAIConfig:
    endpoint: str = ""
    api_key: str = ""
    model: str = ""
    # reference include/api_ai_overview.hpp:19
    api_version: str = "2024-02-15-preview"

    @property
    def enabled(self) -> bool:
        return bool(self.endpoint and self.api_key and self.model)


OVERVIEW_SYSTEM_PROMPT = """You are an AI assistant that generates short, informative overviews of search results in proper markdown format with headings and newline chars.

    Your task is to analyze the provided search results and create a comprehensive summary that:

    1. Answers the user's query directly
    2. Synthesizes information from multiple sources
    3. Highlights key findings and relevant details
    4. Maintains accuracy and avoids speculation
    5. Cites specific documents when appropriate

    TO SUCCEED, FOLLOW THESE RULES:
    - The first paragraph should directly answer the user's query.
    - Add a horizontal rule (---) after the first paragraph.
    - The first paragraph should be VERY SHORT.
    - The overall overview should be SHORT.
    - If the query is unrelated to the search results, state that clearly, and keep the response VERY VERY SHORT.
    - Format it in proper markdown.
    - Use appropriate markdown headings wherever needed."""

SUMMARY_SYSTEM_PROMPT = """You are an AI assistant that generates short, informative summaries of scientific abstracts in proper markdown format with headings and newline chars.

    Your task is to analyze the provided abstract and create a clear summary that:

    1. Captures the main findings and key points
    2. Highlights the research objective and methodology if present
    3. Summarizes conclusions and implications
    4. Maintains scientific accuracy without speculation
    5. Uses clear, accessible language

    To SUCCEED, FOLLOW THIS RULE:
    - Format it in proper markdown with appropriate headings wherever needed."""


def build_overview_user_prompt(query: str, search_results: dict) -> str:
    parts = [f"User Query: {query}\n\n", "Search Results:\n\n"]
    results = search_results.get("results")
    if isinstance(results, list):
        for rank, result in enumerate(results, 1):
            parts.append(f"Document {rank}:\n")
            if "title" in result:
                parts.append(f"Title: {result['title']}\n")
            if "cord_uid" in result:
                parts.append(f"ID: {result['cord_uid']}\n")
            if "bm25_score" in result:
                parts.append(f"Relevance Score: {result['bm25_score']}\n")
            if "url" in result:
                parts.append(f"URL: {result['url']}\n")
            if "author" in result:
                parts.append(f"Author: {result['author']}\n")
            if "publish_time" in result:
                parts.append(f"Published: {result['publish_time']}\n")
            parts.append("\n")
    parts.append("Please provide a comprehensive AI overview based on these search results.")
    return "".join(parts)


def build_summary_user_prompt(title: str, abstract: str) -> str:
    parts = []
    if title:
        parts.append(f"Document Title: {title}\n\n")
    parts.append(f"Abstract:\n{abstract}\n\n")
    parts.append("Please provide a concise summary of this abstract.")
    return "".join(parts)


def default_transport(host: str, path: str, headers: dict, body: str) -> str:
    import http.client

    try:
        conn = http.client.HTTPSConnection(host, timeout=60)
        conn.request("POST", path, body=body, headers=headers)
        res = conn.getresponse()
        data = res.read().decode("utf-8", errors="replace")
        if res.status == 200:
            return data
        log("https_post", f"Request failed - Status: {res.status}")
        return ""
    except OSError as e:
        log("https_post", f"Exception: {e}")
        return ""


def make_https_post(
    url: str, path: str, api_key: str, body: str, transport: Optional[Transport] = None
) -> str:
    host = url
    if host.startswith("https://"):
        host = host[8:]
    if host.endswith("/"):
        host = host[:-1]
    headers = {"Content-Type": "application/json", "api-key": api_key}
    return (transport or default_transport)(host, path, headers, body)


def _chat_request(config: AzureOpenAIConfig, system: str, user: str, max_tokens: int):
    path = (
        f"/openai/deployments/{config.model}"
        f"/chat/completions?api-version={config.api_version}"
    )
    body = {
        "messages": [
            {"role": "system", "content": system},
            {"role": "user", "content": user},
        ],
        "max_completion_tokens": max_tokens,
    }
    return path, json.dumps(body)


def generate_ai_overview(
    config: AzureOpenAIConfig,
    query: str,
    k: int,
    search_results: dict,
    engine=None,
    stats=None,
    is_authorized: bool = False,
    transport: Optional[Transport] = None,
) -> dict:
    response: dict = {}
    if stats is not None:
        stats.increment_ai_overview_calls()

    if engine is not None:
        cache_key = engine.make_cache_key(query, k)
        cached = engine.ai_overview_cache.get(cache_key)
        if cached is not None and cached.get("from_cache"):
            if stats is not None:
                stats.increment_ai_overview_cache_hits()
            cached.pop("from_cache", None)
            cached["cached"] = True
            return cached

    try:
        path, body_str = _chat_request(
            config,
            OVERVIEW_SYSTEM_PROMPT,
            build_overview_user_prompt(query, search_results),
            1000,
        )
        if stats is not None and not is_authorized:
            stats.decrement_ai_api_calls()

        response_body = make_https_post(
            config.endpoint, path, config.api_key, body_str, transport
        )
        if not response_body:
            return {"error": "Failed to connect to Azure OpenAI", "success": False}

        api_response = json.loads(response_body)
        if "error" in api_response:
            return {
                "error": "Azure OpenAI API error",
                "details": api_response["error"],
                "success": False,
            }
        choices = api_response.get("choices")
        if isinstance(choices, list) and choices:
            message = choices[0].get("message", {})
            if "content" in message:
                response = {
                    "success": True,
                    "overview": message["content"],
                    "model": config.model,
                    "cached": False,
                }
                if "usage" in api_response:
                    response["usage"] = api_response["usage"]
                if engine is not None:
                    engine.ai_overview_cache.put(
                        engine.make_cache_key(query, k), response
                    )
                return response
            return {"error": "Unexpected response structure", "success": False}
        return {"error": "No choices in response", "success": False}
    except (ValueError, KeyError, TypeError) as e:
        return {"error": f"Exception: {e}", "success": False}


def generate_ai_summary(
    config: AzureOpenAIConfig,
    cord_uid: str,
    engine=None,
    stats=None,
    is_authorized: bool = False,
    transport: Optional[Transport] = None,
) -> dict:
    if engine is not None:
        cache_key = f"summary|{cord_uid}"
        cached = engine.ai_summary_cache.get(cache_key)
        if cached is not None and cached.get("from_cache"):
            # cache hit still counts as a call (reference :108-112)
            if stats is not None:
                stats.increment_ai_summary_calls()
                stats.increment_ai_summary_cache_hits()
            cached.pop("from_cache", None)
            cached["cached"] = True
            return cached

    try:
        meta = None
        if engine is not None and engine.metadata is not None:
            meta = engine.metadata.fetch(cord_uid)
        if meta is None:
            return {
                "error": "cord_uid not found in metadata",
                "success": False,
                "cord_uid": cord_uid,
            }
        if not meta.abstract:
            return {
                "error": "No abstract available for this document",
                "success": False,
                "cord_uid": cord_uid,
            }

        path, body_str = _chat_request(
            config,
            SUMMARY_SYSTEM_PROMPT,
            build_summary_user_prompt(meta.title, meta.abstract),
            500,
        )
        if stats is not None and not is_authorized:
            stats.decrement_ai_api_calls()

        response_body = make_https_post(
            config.endpoint, path, config.api_key, body_str, transport
        )
        if not response_body:
            return {
                "error": "Failed to connect to Azure OpenAI",
                "success": False,
                "cord_uid": cord_uid,
            }
        api_response = json.loads(response_body)
        if "error" in api_response:
            return {
                "error": "Azure OpenAI API error",
                "details": api_response["error"],
                "success": False,
                "cord_uid": cord_uid,
            }
        choices = api_response.get("choices")
        if isinstance(choices, list) and choices:
            message = choices[0].get("message", {})
            if "content" in message:
                response = {
                    "success": True,
                    "cord_uid": cord_uid,
                    "summary": message["content"],
                    "cached": False,
                }
                if stats is not None:
                    stats.increment_ai_summary_calls()
                if engine is not None:
                    engine.ai_summary_cache.put(f"summary|{cord_uid}", response)
                return response
            return {
                "error": "Unexpected response structure",
                "success": False,
                "cord_uid": cord_uid,
            }
        return {"error": "No choices in response", "success": False, "cord_uid": cord_uid}
    except (ValueError, KeyError, TypeError) as e:
        return {"error": f"Exception: {e}", "success": False, "cord_uid": cord_uid}
