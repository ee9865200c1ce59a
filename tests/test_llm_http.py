"""HTTP LLM client tests against a local loopback server: retry-on-429,
token accounting from the usage payload, and per-row isolation of
permanent failures (UD1 semantics, ref deepinfra.py:25-74)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.pipeline.llm import llm_map


class MockLLMHandler(BaseHTTPRequestHandler):
    """429s the first attempt per prompt, then succeeds; prompts
    containing 'hardfail' always 500."""

    attempts: dict[str, int] = {}
    lock = threading.Lock()

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        prompt = body["messages"][-1]["content"]
        with self.lock:
            n = self.attempts.get(prompt, 0) + 1
            self.attempts[prompt] = n
        if "hardfail" in prompt:
            self.send_response(500)
            self.end_headers()
            return
        if n == 1:
            self.send_response(429)
            self.end_headers()
            return
        payload = {
            "choices": [{"message": {"content": f"echo:{prompt}"}}],
            "usage": {"prompt_tokens": len(prompt.split()), "completion_tokens": 2},
        }
        data = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture(scope="module")
def llm_server():
    MockLLMHandler.attempts = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), MockLLMHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_http_client_retries_and_isolates(spark, llm_server):
    df = spark.createDataFrame(
        [("p1 alpha",), ("p2 beta gamma",), ("p3 hardfail",)], "prompt string"
    ).coalesce(1)
    out = llm_map(
        df,
        client_spec={
            "kind": "http",
            "base_url": llm_server,
            "timeout": 10,
            "max_retries": 3,
        },
        model="m",
        temperature=0.0,
        max_tokens=16,
    ).collect()
    by = {r["prompt"]: r for r in out}
    # 429 on first attempt → retried → success with echoed content
    assert by["p1 alpha"]["content"] == "echo:p1 alpha"
    assert by["p1 alpha"]["error"] is None
    assert by["p1 alpha"]["input_tokens"] == 2
    assert by["p2 beta gamma"]["output_tokens"] == 2
    # permanent 500 exhausts retries → row-level error, others unaffected
    assert by["p3 hardfail"]["content"] is None
    assert "500" in by["p3 hardfail"]["error"] or "Error" in by["p3 hardfail"]["error"]
    # each successful prompt needed exactly 2 attempts (429 then 200),
    # the hard failure exactly max_retries
    assert MockLLMHandler.attempts["p1 alpha"] == 2
    assert MockLLMHandler.attempts["p3 hardfail"] == 3
