"""HTTP serving front-end: request/response fidelity vs direct engine
runs, streaming, validation, stats, and concurrent clients."""

import json
import threading
import urllib.request
import urllib.error

import numpy as np
import jax
import pytest

from ee274_convexcaldera_llm_quantization_tpu.models import llama
from ee274_convexcaldera_llm_quantization_tpu.models.config import TINY
from ee274_convexcaldera_llm_quantization_tpu.serve.engine import (
    Request, ServingEngine)
from ee274_convexcaldera_llm_quantization_tpu.serve.http_server import (
    ServingHTTPServer)


def _prompt(n, seed=3):
    return [int(t) for t in np.asarray(jax.random.randint(
        jax.random.PRNGKey(seed), (n,), 1, TINY.vocab_size))]


@pytest.fixture(scope="module")
def server():
    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    engine = ServingEngine(params, TINY, max_slots=2, max_seq_len=64,
                           use_pallas=False)
    srv = ServingHTTPServer(engine, port=0).start()
    yield srv
    srv.stop()


def _post(srv, body, path="/v1/completions"):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _reference_tokens(prompt, max_tokens):
    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    eng = ServingEngine(params, TINY, max_slots=2, max_seq_len=64,
                        use_pallas=False)
    eng.submit(Request(uid=0, prompt=np.asarray(prompt, np.int32),
                       max_new_tokens=max_tokens))
    [comp] = eng.run()
    return comp.tokens


class TestHTTP:
    def test_health_and_stats(self, server):
        with urllib.request.urlopen(
                f"http://{server.host}:{server.port}/health") as r:
            assert json.loads(r.read()) == {"status": "ok"}
        with urllib.request.urlopen(
                f"http://{server.host}:{server.port}/v1/stats") as r:
            stats = json.loads(r.read())
        assert stats["max_slots"] == 2

    def test_completion_matches_direct_engine(self, server):
        prompt = _prompt(5)
        out = _post(server, {"prompt": prompt, "max_tokens": 8})
        assert out["finished_reason"] == "length"
        assert out["prompt_len"] == 5
        assert out["tokens"] == _reference_tokens(prompt, 8)

    def test_concurrent_clients(self, server):
        prompts = [_prompt(4 + i, seed=50 + i) for i in range(4)]
        results = {}

        def worker(i):
            results[i] = _post(server,
                               {"prompt": prompts[i], "max_tokens": 6})

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(180)
        assert sorted(results) == [0, 1, 2, 3]
        for i in range(4):
            assert len(results[i]["tokens"]) == 6

    def test_streaming(self, server):
        prompt = _prompt(5)
        req = urllib.request.Request(
            f"http://{server.host}:{server.port}/v1/completions",
            data=json.dumps({"prompt": prompt, "max_tokens": 8,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        tokens, fin = [], None
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            for raw in r:
                line = raw.decode().strip()
                if not line.startswith("data: "):
                    continue
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    break
                obj = json.loads(payload)
                if "tokens" in obj:
                    tokens.extend(obj["tokens"])
                if "finished_reason" in obj:
                    fin = obj["finished_reason"]
        assert fin == "length"
        assert tokens == _reference_tokens(prompt, 8)

    def test_validation_errors(self, server):
        for body in ({}, {"prompt": []}, {"prompt": "text"},
                     {"prompt": [1.5, 2]}):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(server, body)
            assert e.value.code == 400
        # over max_seq_len
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, {"prompt": _prompt(5), "max_tokens": 100})
        assert e.value.code == 400

    def test_paged_engine_backend(self):
        """The HTTP front-end is engine-generic: the paged engine (C++
        scheduler/allocator) serves the same API."""
        from ee274_convexcaldera_llm_quantization_tpu.serve.paged_engine import (
            PagedServingEngine)
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        engine = PagedServingEngine(params, TINY, max_slots=2, num_pages=16,
                                    page_size=8, use_pallas=False)
        srv = ServingHTTPServer(engine, port=0).start()
        try:
            out = _post(srv, {"prompt": _prompt(5), "max_tokens": 6})
            assert len(out["tokens"]) == 6
            assert out["finished_reason"] == "length"
            stats = json.loads(urllib.request.urlopen(
                f"http://{srv.host}:{srv.port}/v1/stats").read())
            assert stats["max_slots"] == 2
        finally:
            srv.stop()

    def test_tokenizer_hook(self):
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        engine = ServingEngine(params, TINY, max_slots=1, max_seq_len=64,
                               use_pallas=False)
        srv = ServingHTTPServer(
            engine, port=0,
            tokenizer=lambda s: [ord(c) % TINY.vocab_size for c in s]
        ).start()
        try:
            out = _post(srv, {"prompt": "hello", "max_tokens": 4})
            assert len(out["tokens"]) == 4 and out["prompt_len"] == 5
        finally:
            srv.stop()
