"""The LLM chat-completion map stage (SURVEY §2.10 UD1) — the engine's one
true black-box UDF.

Reference behavior (`backend/app/services/deepinfra.py:25-74`): per row,
POST to a chat-completions API with model/messages/temperature/max_tokens;
3 attempts with 2^attempt backoff on 429/5xx; 120 s timeout; returns
content + prompt/completion token counts.  Failures are isolated per row
(ST4): the output carries an ``error`` column instead of failing the task.

Spark shape: Arrow-batched ``mapInPandas``.  The batch closure is fully
self-contained (no references back into this package) so executor Python
workers need nothing on their path.  The client is chosen by a plain-dict
``client_spec``:

* ``{"kind": "mock", "mode": "mcq"|"judge"|"plain", "fail_marker": ...}``
  — deterministic offline stand-in for tests/benchmarks.
* ``{"kind": "http", "base_url": ..., "api_key_env": ..., "timeout": 120,
  "max_retries": 3}`` — stdlib-urllib OpenAI-style endpoint.

Exactly-once story (ST3): this stage is side-effect-free per Spark's
contract — task retries recompute rows, and the *sink* dedups via
anti-join on deterministic row ids (see generation/judging).

Scale notes: parallelism (and hence request concurrency against the API)
is bounded by ``df.repartition(k)`` before this stage — the analog of the
reference's single-threaded loop is k=1, but any k works because rows are
independent; rate limits are respected by choosing k and per-row backoff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

LLM_OUTPUT_FIELDS = [
    StructField("content", StringType(), True),
    StructField("input_tokens", IntegerType(), True),
    StructField("output_tokens", IntegerType(), True),
    StructField("error", StringType(), True),
]


def llm_map(
    df: DataFrame,
    *,
    client_spec: dict,
    model: str,
    temperature: float,
    max_tokens: int,
    prompt_col: str = "prompt",
    system_col: str | None = None,
    completed_acc=None,
    failed_acc=None,
) -> DataFrame:
    """Append content/input_tokens/output_tokens/error columns by calling
    the LLM once per row, Arrow batch at a time."""
    out_schema = StructType(list(df.schema.fields) + list(LLM_OUTPUT_FIELDS))
    spec = dict(client_spec)
    cfg = {
        "model": model,
        "temperature": float(temperature),
        "max_tokens": int(max_tokens),
        "prompt_col": prompt_col,
        "system_col": system_col,
    }

    def run(batches):
        # -- fully self-contained: stdlib + pandas only ------------------
        import hashlib
        import json
        import os
        import time
        import urllib.error
        import urllib.request

        import pandas as _pd

        def mock_call(prompt: str, system: str | None):
            marker = spec.get("fail_marker")
            if marker and marker in prompt:
                raise RuntimeError("injected mock failure")
            h = int(hashlib.md5(prompt.encode("utf-8")).hexdigest(), 16)
            mode = spec.get("mode", "plain")
            if mode == "mcq":
                n = int(spec.get("n_choices", 4))
                letter = chr(ord("A") + h % n)
                content = (
                    f"<think>deterministic mock reasoning {h % 997}</think>\n"
                    f"The answer is ###{letter}###"
                )
            elif mode == "judge":
                score = (h % 101) / 100.0
                content = (
                    f"<think>weighing the answer {h % 997}</think>\n"
                    f"Assessment complete. [[{score}]]"
                )
            else:
                content = f"mock response {h % 100000}"
            return content, len(prompt.split()), len(content.split())

        def http_call(prompt: str, system: str | None):
            base_url = spec["base_url"].rstrip("/")
            timeout = float(spec.get("timeout", 120.0))
            max_retries = int(spec.get("max_retries", 3))
            key = os.environ.get(spec.get("api_key_env", ""), "")
            messages = []
            if system:
                messages.append({"role": "system", "content": system})
            messages.append({"role": "user", "content": prompt})
            body = json.dumps(
                {
                    "model": cfg["model"],
                    "messages": messages,
                    "temperature": cfg["temperature"],
                    "max_tokens": cfg["max_tokens"],
                }
            ).encode("utf-8")
            last_err = None
            for attempt in range(max_retries):
                try:
                    req = urllib.request.Request(
                        f"{base_url}/chat/completions",
                        data=body,
                        headers={
                            "Content-Type": "application/json",
                            **({"Authorization": f"Bearer {key}"} if key else {}),
                        },
                    )
                    with urllib.request.urlopen(req, timeout=timeout) as resp:
                        payload = json.loads(resp.read().decode("utf-8"))
                    usage = payload.get("usage", {})
                    return (
                        payload["choices"][0]["message"]["content"],
                        int(usage.get("prompt_tokens", 0)),
                        int(usage.get("completion_tokens", 0)),
                    )
                except urllib.error.HTTPError as e:
                    last_err = e
                    if e.code in (429, 500, 502, 503) and attempt < max_retries - 1:
                        time.sleep(2**attempt)
                        continue
                    raise
                except Exception as e:  # timeouts, connection resets
                    last_err = e
                    if attempt < max_retries - 1:
                        time.sleep(2**attempt)
                        continue
                    raise
            raise last_err  # pragma: no cover

        call = mock_call if spec.get("kind", "mock") == "mock" else http_call

        for pdf in batches:
            contents, in_toks, out_toks, errors = [], [], [], []
            prompts = pdf[cfg["prompt_col"]]
            systems = pdf[cfg["system_col"]] if cfg["system_col"] else [None] * len(pdf)
            for prompt, system in zip(prompts, systems):
                try:
                    content, it, ot = call(prompt, system)
                    contents.append(content)
                    in_toks.append(it)
                    out_toks.append(ot)
                    errors.append(None)
                    if completed_acc is not None:
                        completed_acc.add(1)
                except Exception as e:  # ST4: isolate, never fail the task
                    contents.append(None)
                    in_toks.append(None)
                    out_toks.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
                    if failed_acc is not None:
                        failed_acc.add(1)
            out = pdf.copy()
            out["content"] = contents
            out["input_tokens"] = _pd.array(in_toks, dtype="Int32")
            out["output_tokens"] = _pd.array(out_toks, dtype="Int32")
            out["error"] = errors
            yield out

    return df.mapInPandas(run, schema=out_schema)
