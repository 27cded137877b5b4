"""functions/ai.py HttpBackend — the production LLM path, end-to-end
through ai_classify / ai_complete / ai_generate / ai_generate_file against
a deterministic local stub HTTP server (reference surface:
logistics_AI.sql:126-141, media_ai.sql:229-257; CI stays model-free).

Pins the four production contracts VERDICT r3 asked for: per-Arrow-batch
request batching, bounded-rate pacing, retry-with-backoff on transient
failure, and NULL-on-failure (a chunk that exhausts retries yields NULL
outputs, never a job failure), plus WITH-SCHEMA type coercion and closure
capture (the backend must ride inside the pickled UDF, not a module
global the executor re-imports as the mock).
"""

from __future__ import annotations

import base64
import hashlib
import json
import pickle
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest
from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.functions.ai import (
    HttpBackend,
    MockBackend,
    ai_classify,
    ai_complete,
    ai_generate,
    ai_generate_file,
    set_backend,
)


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.requests: list[dict] = []  # {path, n_items, t, schema}
        self.fail_remaining: dict[str, int] = {}  # path -> 500s still to serve


def _handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            payload = json.loads(self.rfile.read(n))
            with state.lock:
                state.requests.append(
                    {
                        "path": self.path,
                        "n_items": len(payload.get("items", [])),
                        "t": time.monotonic(),
                        "schema": payload.get("schema"),
                    }
                )
                fail = state.fail_remaining.get(self.path, 0)
                if fail > 0:
                    state.fail_remaining[self.path] = fail - 1
            if self.path == "/dead" or fail > 0:
                self.send_response(500)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return

            task, items = payload["task"], payload["items"]
            if task == "classify":
                labels = payload["labels"]
                results = [
                    next((l for l in labels if l.lower() in (t or "").lower()),
                         "out-of-set")
                    for t in items
                ]
            elif task == "complete":
                results = ["srv:" + (p or "")[:12] for p in items]
            elif task == "generate":
                results = []
                for p in items:
                    toks = (p or "").split()
                    row = {"summary": " ".join(toks[:3]), "n_words": len(toks)}
                    if "BADINT" in p:
                        row["n_words"] = "notanint"  # coercion failure -> NULL
                    if "STRNUM" in p:
                        row["n_words"] = str(len(toks))  # '4' -> 4 coerces
                    if "NONOBJ" in p:
                        row = "just a string"  # whole row -> NULLs
                    results.append(row)
            elif task == "embed":
                dim = payload["dim"]
                results = []
                for t_ in items:
                    if "BADVEC" in (t_ or ""):
                        results.append([1.0] * (dim - 1))  # wrong length -> NULL
                    else:
                        v = [0.0] * dim
                        for i, w in enumerate((t_ or "").split()):
                            v[(len(w) + i) % dim] += 1.0
                        results.append(v)
            elif task == "generate_file":
                results = []
                for it in items:
                    raw = base64.b64decode(it["file_b64"])
                    results.append(
                        {"content_bytes": len(raw),
                         "digest": hashlib.md5(raw).hexdigest()[:8]}
                    )
            else:
                self._json({"error": f"unknown task {task}"}, code=400)
                return
            self._json({"results": results})

    return Handler


@pytest.fixture()
def stub():
    state = _State()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        yield url, state
    finally:
        set_backend(MockBackend())  # never leak the HTTP backend into other tests
        server.shutdown()
        server.server_close()


def _texts_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    ).repartition(1)


# ------------------------------------------------------------- batching


def test_complete_batches_per_request_through_spark(spark, stub):
    url, state = stub
    set_backend(HttpBackend(f"{url}/llm", batch_size=10))
    df = _texts_df(spark, [f"prompt number {i}" for i in range(25)])
    got = {r["id"]: r["out"] for r in
           df.select("id", ai_complete(F.col("text")).alias("out")).collect()}
    assert got == {i: "srv:" + f"prompt number {i}"[:12] for i in range(25)}
    reqs = [r for r in state.requests if r["path"] == "/llm"]
    assert len(reqs) == 3  # ceil(25 / 10) — batched, never per-row
    assert sorted(r["n_items"] for r in reqs) == [5, 10, 10]


def test_classify_closed_set_and_nulls(spark, stub):
    url, state = stub
    set_backend(HttpBackend(f"{url}/llm", batch_size=8))
    df = spark.createDataFrame(
        [(0, "all about beta decay"), (1, "alpha rays"), (2, "nothing here"),
         (3, None)],
        "id int, text string",
    ).repartition(1)
    got = {r["id"]: r["lab"] for r in
           df.select("id", ai_classify(F.col("text"), ["alpha", "beta"]).alias("lab"))
             .collect()}
    assert got[0] == "beta"
    assert got[1] == "alpha"
    assert got[2] == "Unknown"  # server answered out-of-set -> closed set enforced
    assert got[3] is None       # NULL prompt never reaches the wire


def test_generate_schema_coercion_through_spark(spark, stub):
    url, state = stub
    set_backend(HttpBackend(f"{url}/llm", batch_size=16))
    df = _texts_df(
        spark,
        ["one two three four", "count BADINT words", "a STRNUM b", "NONOBJ row"],
    )
    out = {r["id"]: r for r in
           df.select(
               "id",
               ai_generate(F.col("text"),
                           [("summary", "string"), ("n_words", "int")]).alias("g"),
           ).select("id", "g.summary", "g.n_words").collect()}
    assert out[0]["summary"] == "one two three" and out[0]["n_words"] == 4
    assert out[1]["n_words"] is None            # 'notanint' fails int coercion
    assert out[2]["n_words"] == 3               # '3' string coerces to int
    assert out[3]["summary"] is None and out[3]["n_words"] is None  # non-object
    # the request carried the JSON schema constraint
    schemas = [r["schema"] for r in state.requests if r["path"] == "/llm"]
    assert schemas and schemas[0] == [
        {"name": "summary", "type": "string"}, {"name": "n_words", "type": "int"}]


def test_generate_file_roundtrip_through_spark(spark, stub):
    url, _ = stub
    set_backend(HttpBackend(f"{url}/llm"))
    payload = b"\x00\x01binary-payload\xff"
    df = spark.createDataFrame([(0, "describe this", bytearray(payload))],
                               "id int, prompt string, content binary")
    row = df.select(
        ai_generate_file(F.col("prompt"), F.col("content"),
                         [("digest", "string"), ("content_bytes", "int")]).alias("g")
    ).select("g.digest", "g.content_bytes").collect()[0]
    assert row["content_bytes"] == len(payload)
    assert row["digest"] == hashlib.md5(payload).hexdigest()[:8]


# ------------------------------------------------------- retry / failure


def test_retry_recovers_from_transient_500s(spark, stub):
    url, state = stub
    state.fail_remaining["/flaky"] = 2
    set_backend(HttpBackend(f"{url}/flaky", retries=3, backoff=0.01))
    df = _texts_df(spark, ["hello world"])
    got = df.select(ai_complete(F.col("text")).alias("out")).collect()
    assert got[0]["out"] == "srv:hello world"
    assert len([r for r in state.requests if r["path"] == "/flaky"]) == 3


def test_exhausted_retries_yield_nulls_not_errors(spark, stub):
    url, state = stub
    set_backend(HttpBackend(f"{url}/dead", retries=1, backoff=0.01))
    df = _texts_df(spark, [f"p{i}" for i in range(4)])
    rows = df.select(
        "id",
        ai_complete(F.col("text")).alias("c"),
        ai_generate(F.col("text"), [("summary", "string"), ("n_words", "int")])
        .alias("g"),
    ).select("id", "c", "g.summary", "g.n_words").collect()
    assert len(rows) == 4  # every row survives
    assert all(r["c"] is None and r["summary"] is None and r["n_words"] is None
               for r in rows)
    assert len([r for r in state.requests if r["path"] == "/dead"]) >= 4


# ------------------------------------------------- pacing / concurrency


def test_rate_limiter_paces_requests(stub):
    url, state = stub
    backend = HttpBackend(f"{url}/llm", batch_size=1, max_concurrency=8,
                          requests_per_second=20.0)
    out = backend.complete(pd.Series([f"p{i}" for i in range(8)]))
    assert list(out) == [f"srv:p{i}" for i in range(8)]
    ts = sorted(r["t"] for r in state.requests if r["path"] == "/llm")
    assert len(ts) == 8
    # 8 sends at 20 rps: >= 7 * 50 ms between first and last (minus jitter)
    assert ts[-1] - ts[0] >= 0.30


def test_backend_is_picklable_after_use(stub):
    url, _ = stub
    backend = HttpBackend(f"{url}/llm", requests_per_second=100.0)
    assert list(backend.complete(pd.Series(["x"]))) == ["srv:x"]  # limiter built
    clone = pickle.loads(pickle.dumps(backend))
    assert list(clone.complete(pd.Series(["y"]))) == ["srv:y"]
    assert clone.requests_per_second == 100.0


def test_http_embed_and_null_on_malformed(spark, stub):
    from apache_iceberg_lakehouse_workshop_spark.functions.ai import ai_embed

    url, state = stub
    set_backend(HttpBackend(url, batch_size=2, max_concurrency=2))
    try:
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "BADVEC text"), (3, None)],
            ["id", "text"],
        ).select("id", ai_embed(F.col("text"), 8).alias("emb"))
        out = {r.id: r.emb for r in df.collect()}
        assert out[1] is not None and len(out[1]) == 8 and sum(out[1]) == 3.0
        assert out[2] is None          # wrong-length vector -> NULL
        assert out[3] is None          # NULL text never leaves the client
        assert any(r["path"] == "/" and r["n_items"] <= 2 for r in state.requests)
    finally:
        set_backend(MockBackend())


def test_mock_embed_deterministic_and_quantization_exact(spark):
    from apache_iceberg_lakehouse_workshop_spark.functions.ai import ai_embed

    df = spark.createDataFrame([(1, "table scan table join")], ["id", "text"])
    a = df.select(ai_embed(F.col("text"), 16).alias("e")).collect()[0]["e"]
    b = df.select(ai_embed(F.col("text"), 16).alias("e")).collect()[0]["e"]
    assert a == b                          # pure function of the text
    assert sum(abs(x) for x in a) == 4.0   # signed counts, one per token
    assert all(float(x).is_integer() for x in a)  # exact under x1000 quantization


# --------------------------------------------- breaker / deadline hardening


def test_circuit_breaker_fails_fast_on_dead_endpoint(stub):
    """After `breaker_threshold` consecutive chunk failures the breaker
    opens: remaining chunks resolve to NULL WITHOUT hitting the wire, so a
    dead gateway costs O(threshold) requests, not retries x chunks."""
    url, state = stub
    b = HttpBackend(
        f"{url}/dead",
        batch_size=1,
        max_concurrency=1,
        retries=1,
        backoff=0.01,
        breaker_threshold=3,
        breaker_cooldown=60.0,
    )
    texts = pd.Series([f"t{i}" for i in range(10)])
    out = b.complete(texts)
    assert out.isna().all()
    with state.lock:
        n_requests = len([r for r in state.requests if r["path"] == "/dead"])
    # 3 chunks x (1 + 1 retry) = 6 wire hits, then the circuit is open
    assert n_requests == 6, f"breaker must stop wire traffic, saw {n_requests}"


def test_circuit_breaker_closes_after_success(stub):
    """A flapping endpoint: failures open the breaker; after cooldown the
    next success closes it and traffic resumes normally."""
    url, state = stub
    b = HttpBackend(
        f"{url}/llm",
        batch_size=1,
        max_concurrency=1,
        retries=0,
        breaker_threshold=2,
        breaker_cooldown=0.2,
    )
    with state.lock:
        state.fail_remaining["/llm"] = 2   # exactly two 500s, then healthy
    out1 = b.complete(pd.Series(["a", "b"]))
    assert out1.isna().all()               # both failed; breaker now open
    out2 = b.complete(pd.Series(["c"]))
    assert out2.isna().all()               # open circuit: fast NULL, no wire
    time.sleep(0.25)                       # cooldown elapses
    out3 = b.complete(pd.Series(["hello world"]))
    assert out3.tolist() == ["srv:hello world"]
    # success closed the circuit; subsequent calls flow
    out4 = b.complete(pd.Series(["again ok"]))
    assert out4.tolist() == ["srv:again ok"]


def test_deadline_caps_retry_spend(stub):
    """The per-chunk deadline bounds wall clock: a dead endpoint with many
    retries configured must give up within ~the budget, not retries x
    timeout."""
    url, _state = stub
    b = HttpBackend(
        f"{url}/dead",
        batch_size=4,
        retries=50,
        backoff=0.2,
        deadline=0.5,
        breaker_threshold=None,
    )
    t0 = time.monotonic()
    out = b.complete(pd.Series(["a", "b"]))
    took = time.monotonic() - t0
    assert out.isna().all()
    assert took < 3.0, f"deadline must cap the chunk, took {took:.1f}s"


def test_classify_sql_path_batches_per_label_set(spark, stub):
    """Round-8 #7: the SQL AI_CLASSIFY path must keep the HTTP backend's
    batching — one POST per DISTINCT label-set per Arrow batch, never one
    per row."""
    from apache_iceberg_lakehouse_workshop_spark.functions.ai import (
        register_sql_udfs,
    )

    url, state = stub
    set_backend(HttpBackend(f"{url}/llm", batch_size=64))
    # re-register so the SQL UDFs close over the HTTP backend
    import apache_iceberg_lakehouse_workshop_spark.functions.ai as ai_mod

    ai_mod._REGISTERED_SESSIONS.discard(id(spark))
    register_sql_udfs(spark)
    df = spark.createDataFrame(
        [(i, f"all about beta decay {i}") for i in range(20)],
        "id int, txt string",
    ).repartition(1)
    df.createOrReplaceTempView("clsin")
    out = spark.sql(
        "SELECT id, "
        "  AI_CLASSIFY(txt, CASE WHEN id % 2 = 0 "
        "    THEN ARRAY('alpha','beta') ELSE ARRAY('beta','gamma') END) AS lab "
        "FROM clsin"
    ).collect()
    assert {r.lab for r in out} == {"beta"}
    reqs = [r for r in state.requests if r["path"] == "/llm"]
    # 20 rows, ONE partition, 2 distinct label-sets -> at most 2 POSTs per
    # Arrow batch (Spark may split the partition into a few batches, but
    # never 20 single-row posts)
    assert len(reqs) <= 4, [r["n_items"] for r in reqs]
    assert sum(r["n_items"] for r in reqs) == 20
