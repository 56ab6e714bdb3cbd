"""API contract tests against an in-process HTTP server (reference shapes)."""

import json
import threading

import pytest

from nextsearch_tpu.api.ai import AzureOpenAIConfig
from nextsearch_tpu.api.feedback import FeedbackManager
from nextsearch_tpu.api.server import ServerContext, make_server
from nextsearch_tpu.api.stats import StatsTracker
from nextsearch_tpu.engine import Engine
from nextsearch_tpu.index.builder import build_segment_arrays
from nextsearch_tpu.index.segmentio import save_manifest, write_segment

from test_engine import DOCS_SEG1, DOCS_SEG2, METADATA_CSV


def _fake_transport(host, path, headers, body):
    req = json.loads(body)
    assert req["messages"][0]["role"] == "system"
    return json.dumps(
        {
            "choices": [{"message": {"content": "## Overview\nmocked"}}],
            "usage": {"total_tokens": 42},
        }
    )


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("api")
    d = tmp / "index"
    (d / "segments").mkdir(parents=True)
    write_segment(build_segment_arrays(DOCS_SEG1), d / "segments" / "seg_000001")
    write_segment(build_segment_arrays(DOCS_SEG2), d / "segments" / "seg_000002")
    save_manifest(d / "manifest.bin", ["seg_000001", "seg_000002"])
    (d / "metadata.csv").write_text(METADATA_CSV)

    engine = Engine(d, cache_dir=tmp)
    assert engine.reload()
    azure = AzureOpenAIConfig("https://fake.example", "key", "gpt-test")
    ctx = ServerContext(
        engine,
        StatsTracker(tmp / "stats.json"),
        FeedbackManager(tmp / "feedback.json"),
        azure,
        transport=_fake_transport,
    )
    srv = make_server(ctx, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, ctx
    srv.shutdown()
    ctx.batcher.shutdown()


def _get(server, path):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server[0].server_port, timeout=30)
    conn.request("GET", path)
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r, (json.loads(body) if body else None)


def _post(server, path, payload=None):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server[0].server_port, timeout=30)
    body = json.dumps(payload) if payload is not None else ""
    conn.request("POST", path, body=body, headers={"Content-Type": "application/json"})
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r, (json.loads(data) if data else None)


def test_health(server):
    r, j = _get(server, "/api/health")
    assert r.status == 200
    assert j == {"ok": True, "segments": 2}
    assert r.getheader("Access-Control-Allow-Origin") == "*"


def test_search_contract(server):
    r, j = _get(server, "/api/search?q=covid+vaccine&k=5")
    assert r.status == 200
    assert j["query"] == "covid vaccine"
    assert j["k"] == 5 and j["segments"] == 2 and j["found"] == 3
    assert j["cached"] is False
    assert j["search_time_ms"] > 0 and j["total_time_ms"] >= j["search_time_ms"]
    assert "cache_lookup_ms" not in j
    assert j["results"][0]["cord_uid"] == "uid01"

    # second call: cached semantics
    r2, j2 = _get(server, "/api/search?q=covid+vaccine&k=5")
    assert j2["cached"] is True
    assert j2["search_time_ms"] == 0.0
    assert j2["cache_lookup_ms"] >= 0
    assert "from_cache" not in j2


def test_search_missing_q(server):
    r, j = _get(server, "/api/search")
    assert r.status == 400 and j == {"error": "missing q param"}


def test_search_bad_k_is_500(server):
    # std::stoi throws -> exception handler -> 500 internal server error
    r, j = _get(server, "/api/search?q=covid&k=abc")
    assert r.status == 500 and j == {"error": "internal server error"}
    # but stoi("12abc") parses the prefix
    r2, j2 = _get(server, "/api/search?q=covid&k=3abc")
    assert r2.status == 200 and j2["k"] == 3


def test_suggest_contract(server):
    r, j = _get(server, "/api/suggest?q=cov&k=3")
    assert r.status == 200
    assert j["query"] == "cov" and j["limit"] == 3
    assert j["suggestions"][0] == "covid"
    r2, j2 = _get(server, "/api/suggest")
    assert r2.status == 400 and j2 == {"error": "missing q param"}


def test_reload(server):
    r, j = _post(server, "/api/reload")
    assert r.status == 200
    assert j == {"reloaded": True, "segments": 2}


def test_feedback_validation(server):
    r, j = _post(server, "/api/feedback", {"message": "great", "type": "anonymous"})
    assert r.status == 200 and j["success"] is True and j["total_count"] >= 1

    r, j = _post(server, "/api/feedback", {"type": "anonymous"})
    assert r.status == 400 and j["error"] == "missing or invalid 'message' field"

    r, j = _post(server, "/api/feedback", {"message": "x"})
    assert r.status == 400 and j["error"] == "missing or invalid 'type' field"

    r, j = _post(server, "/api/feedback", {"message": "x", "type": "positive"})
    assert r.status == 400 and j["error"] == "type must be 'anonymous' or 'replyable'"

    r, j = _post(server, "/api/feedback", {"message": "x", "type": "replyable"})
    assert r.status == 400
    assert j["error"] == "email is required for 'replyable' type feedback"

    r, j = _post(
        server, "/api/feedback",
        {"message": "x", "type": "replyable", "email": "a@b.c"},
    )
    assert r.status == 200

    import http.client

    conn = http.client.HTTPConnection(
        "127.0.0.1", server[0].server_port, timeout=10
    )
    conn.request("POST", "/api/feedback", body="{not json",
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    j = json.loads(resp.read())
    conn.close()
    assert resp.status == 400 and j["error"] == "invalid JSON in request body"


def test_stats_contract(server):
    r, j = _get(server, "/api/stats")
    assert r.status == 200
    for key in (
        "total_searches", "search_cache_hits", "search_cache_hit_rate",
        "ai_overview_calls", "ai_overview_cache_hit_rate",
        "ai_summary_calls", "ai_summary_cache_hit_rate",
        "ai_api_calls_remaining", "ai_api_calls_used",
        "last_10_feedback", "total_feedback_count",
    ):
        assert key in j, key
    assert j["total_searches"] >= 1


def test_ai_overview(server):
    r, j = _get(server, "/api/ai_overview?q=covid&k=5")
    assert r.status == 200
    assert j["query"] == "covid"
    assert j["overview"].startswith("## Overview")
    assert j["model"] == "gpt-test"
    assert j["usage"] == {"total_tokens": 42}

    # quota decremented once; cached second call does not decrement
    remaining1 = server[1].stats.get_ai_api_calls_remaining()
    r2, j2 = _get(server, "/api/ai_overview?q=covid&k=5")
    assert r2.status == 200
    assert server[1].stats.get_ai_api_calls_remaining() == remaining1

    r3, j3 = _get(server, "/api/ai_overview")
    assert r3.status == 400 and j3 == {"error": "missing q param"}

    r4, j4 = _get(server, "/api/ai_overview?q=zzznothing")
    assert r4.status == 404
    assert j4["error"] == "No search results found for the query"


def test_ai_summary(server):
    r, j = _get(server, "/api/ai_summary?cord_uid=uid01")
    assert r.status == 200
    assert j["cord_uid"] == "uid01" and j["summary"].startswith("## Overview")
    assert j["cached"] is False
    r2, j2 = _get(server, "/api/ai_summary?cord_uid=uid01")
    assert r2.status == 200 and j2["cached"] is True

    r3, j3 = _get(server, "/api/ai_summary?cord_uid=nosuch")
    assert r3.status == 404
    assert j3["error"] == "cord_uid not found in metadata"

    r4, j4 = _get(server, "/api/ai_summary")
    assert r4.status == 400 and j4 == {"error": "missing cord_uid param"}


def test_add_document_disabled(server):
    r, j = _post(server, "/api/add_document", {})
    assert r.status == 503
    assert j == {"error": '"Add Document" is disabled for the current version'}


def test_options_preflight(server):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server[0].server_port, timeout=10)
    conn.request(
        "OPTIONS", "/api/search",
        headers={"Access-Control-Request-Method": "GET",
                 "Access-Control-Request-Headers": "X-Custom"},
    )
    r = conn.getresponse()
    r.read()
    conn.close()
    assert r.status == 204
    assert "GET, OPTIONS" in r.getheader("Access-Control-Allow-Methods")
    assert r.getheader("Access-Control-Allow-Headers") == "X-Custom"


def test_unknown_route(server):
    r, j = _get(server, "/api/nope")
    assert r.status == 404


def test_concurrent_searches_batched(server):
    """Concurrent distinct queries must all succeed (batcher coalesces)."""
    import http.client

    results = {}

    def hit(q):
        conn = http.client.HTTPConnection(
            "127.0.0.1", server[0].server_port, timeout=30
        )
        conn.request("GET", f"/api/search?q={q}&k=3")
        r = conn.getresponse()
        results[q] = json.loads(r.read())
        conn.close()

    qs = ["trial", "immunity", "transmission", "efficacy", "study", "dynamics"]
    threads = [threading.Thread(target=hit, args=(q,)) for q in qs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for q in qs:
        assert results[q]["query"] == q
        assert results[q]["found"] >= 1, q


def test_stats_timings_extension(server):
    r, j = _get(server, "/api/stats?timings=1")
    assert r.status == 200
    assert "engine_timings" in j
    assert j["index"]["segments"] == 2
    assert j["index"]["docs"] == 3
    # plain stats unchanged
    r2, j2 = _get(server, "/api/stats")
    assert "engine_timings" not in j2 and "index" not in j2


def test_search_hybrid_param_without_embeddings_falls_back(server):
    r, j = _get(server, "/api/search?q=covid&k=3&hybrid=1")
    assert r.status == 200
    assert "hybrid" not in j  # no embeddings loaded -> plain BM25 shape


def test_search_batch_endpoint(server):
    # ours (no reference route): many queries per request, results in order,
    # same per-query shape as /api/search
    payload = {"queries": [{"q": "covid", "k": 3}, {"q": "vaccine trial", "k": 2}]}
    r, j = _post(server, "/api/search_batch", payload)
    assert r.status == 200
    assert len(j["results"]) == 2
    assert j["results"][0]["query"] == "covid"
    assert j["results"][1]["query"] == "vaccine trial"
    for res in j["results"]:
        assert "cached" in res and isinstance(res["results"], list)
    assert j["search_time_ms"] >= 0
    # per-query response matches the single-query route
    r2, j2 = _get(server, "/api/search?q=covid&k=3")
    assert j2["found"] == j["results"][0]["found"]


def test_search_batch_endpoint_validation(server):
    r, j = _post(server, "/api/search_batch", {"queries": []})
    assert r.status == 400
    r, j = _post(server, "/api/search_batch", {})
    assert r.status == 400
    # per-item error isolation: a malformed item errors in ITS slot, the
    # request still succeeds (VERDICT r4 weak-4)
    r, j = _post(server, "/api/search_batch", {"queries": [{"k": 3}]})
    assert r.status == 200
    assert j["results"][0]["error"] == "each query needs q"


def test_search_batch_k_stoi_parity(server):
    # "k" on the batch route follows the same stoi() semantics as GET
    # /api/search: leading-integer parse ("10abc" -> 10), floats truncate,
    # and a non-numeric k errors only its own item.
    payload = {
        "queries": [
            {"q": "covid", "k": "2abc"},
            {"q": "covid", "k": 2.9},
            {"q": "covid", "k": "xyz"},
            {"q": "vaccine trial", "k": 2},
        ]
    }
    r, j = _post(server, "/api/search_batch", payload)
    assert r.status == 200
    res = j["results"]
    assert res[0]["k"] == 2 and res[1]["k"] == 2
    assert res[2]["error"] == "invalid k param"
    assert res[3]["query"] == "vaccine trial" and "error" not in res[3]
    # GET parity check for the same malformed k
    r2, _ = _get(server, "/api/search?q=covid&k=2abc")
    assert r2.status == 200


def test_search_batch_native_render(tmp_path):
    """Server with config.native_render: batch route streams pre-rendered
    fragments; single route converts to the reference dict shape; values
    match the Python-render server bit-for-bit."""
    from dataclasses import replace

    from nextsearch_tpu import native
    from nextsearch_tpu.config import DEFAULT_CONFIG

    if not native.available():
        pytest.skip("native library unavailable")

    d = tmp_path / "index"
    (d / "segments").mkdir(parents=True)
    write_segment(build_segment_arrays(DOCS_SEG1), d / "segments" / "seg_000001")
    write_segment(build_segment_arrays(DOCS_SEG2), d / "segments" / "seg_000002")
    save_manifest(d / "manifest.bin", ["seg_000001", "seg_000002"])
    (d / "metadata.csv").write_text(METADATA_CSV)

    engine = Engine(
        d, config=replace(DEFAULT_CONFIG, native_render=True),
        cache_dir=tmp_path,
    )
    assert engine.reload()
    ctx = ServerContext(
        engine,
        StatsTracker(tmp_path / "stats.json"),
        FeedbackManager(tmp_path / "feedback.json"),
        AzureOpenAIConfig("", "", ""),
    )
    srv = make_server(ctx, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        sv = (srv, ctx)
        payload = {"queries": [{"q": "covid vaccine", "k": 3},
                               {"q": "influenza", "k": 2}]}
        r, j = _post(sv, "/api/search_batch", payload)
        assert r.status == 200
        assert [x["query"] for x in j["results"]] == ["covid vaccine", "influenza"]
        first = j["results"][0]
        assert first["cached"] is False and first["found"] >= 1
        assert first["results"][0]["cord_uid"] == "uid01"
        assert first["results"][0]["title"] == "COVID Vaccine Trial"
        assert first["results"][0]["url"] == "https://a.example/1"  # ';' cut
        assert first["results"][0]["author"] == "Smith et al."
        # repeat -> served from cache with cached=true, same values
        r2, j2 = _post(sv, "/api/search_batch", payload)
        second = j2["results"][0]
        assert second["cached"] is True
        assert second["results"] == first["results"]
        # single route: reference shape with timing fields
        r3, j3 = _get(sv, "/api/search?q=covid+vaccine&k=3")
        assert r3.status == 200 and j3["cached"] is True
        assert j3["results"] == first["results"]
        assert "search_time_ms" in j3 and "total_time_ms" in j3
    finally:
        srv.shutdown()
        ctx.batcher.shutdown()
