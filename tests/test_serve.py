"""Serving stack: controller registry/dispatch/heartbeat + worker e2e."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from handsonvlm_tpu.serve import controller as ctrl_mod
from handsonvlm_tpu.serve.controller import Controller, serve_controller


def _post(url, payload, timeout=10.0):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_controller_registry_and_dispatch():
    c = Controller("shortest_queue")
    try:
        status = {"model_names": ["handsonvlm-7b"], "speed": 1, "queue_length": 0}
        assert c.register_worker("http://w1", True, status)
        assert c.register_worker("http://w2", True, dict(status, queue_length=5))
        assert c.list_models() == ["handsonvlm-7b"]
        # shortest queue picks w1
        assert c.get_worker_address("handsonvlm-7b") == "http://w1"
        assert c.get_worker_address("unknown-model") == ""
        # heartbeats update queue length
        assert c.receive_heart_beat("http://w1", 10)
        assert not c.receive_heart_beat("http://nope", 0)
        assert c.get_worker_address("handsonvlm-7b") == "http://w2"
    finally:
        c.stop()


def test_controller_expiry(monkeypatch):
    c = Controller("lottery")
    try:
        status = {"model_names": ["m"], "speed": 1, "queue_length": 0}
        c.register_worker("http://w1", True, status)
        c.worker_info["http://w1"].last_heart_beat = time.time() - 100
        c.remove_stale_workers_by_expiration()
        assert c.list_models() == []
    finally:
        c.stop()


def test_http_roundtrip_controller():
    controller, server = serve_controller("127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        r = _post(base + "/register_worker", {
            "worker_name": "http://wA",
            "check_heart_beat": True,
            "worker_status": {"model_names": ["tiny"], "speed": 1, "queue_length": 0},
        })
        assert r["ok"]
        assert _post(base + "/list_models", {})["models"] == ["tiny"]
        assert _post(base + "/get_worker_address", {"model": "tiny"})["address"] == "http://wA"
        assert _post(base + "/receive_heart_beat", {"worker_name": "http://wA", "queue_length": 2})["exist"]
        st = _post(base + "/worker_get_status", {})
        assert st["model_names"] == ["tiny"] and st["queue_length"] == 2
    finally:
        server.shutdown()
        controller.stop()


def test_worker_generate_e2e(tmp_path):
    """Full loop: controller + tiny-model worker + generate request,
    the streamed variant, and the web UI proxy on top."""
    from handsonvlm_tpu.serve.model_worker import ModelWorker, serve_worker
    from handsonvlm_tpu.serve.web_server import serve_web

    controller, ctrl_server = serve_controller("127.0.0.1", 0)
    ctrl_port = ctrl_server.server_address[1]
    threading.Thread(target=ctrl_server.serve_forever, daemon=True).start()
    ctrl_addr = f"http://127.0.0.1:{ctrl_port}"

    worker = ModelWorker(
        ctrl_addr, "http://127.0.0.1:0", "random:tiny", preset="tiny",
        model_name="handsonvlm-tiny",
    )
    w_server = serve_worker(worker, "127.0.0.1", 0)
    w_port = w_server.server_address[1]
    threading.Thread(target=w_server.serve_forever, daemon=True).start()
    # register with the real worker port so the web proxy can reach it
    worker.worker_addr = f"http://127.0.0.1:{w_port}"
    worker.register()
    web_server = serve_web(ctrl_addr, "127.0.0.1", 0, logdir=str(tmp_path))
    web_port = web_server.server_address[1]
    threading.Thread(target=web_server.serve_forever, daemon=True).start()
    try:
        addr = _post(ctrl_addr + "/get_worker_address", {"model": "handsonvlm-tiny"})["address"]
        assert addr  # registered at startup
        out = _post(
            f"http://127.0.0.1:{w_port}/worker_generate",
            {"prompt": "Where should my hand move?", "max_new_tokens": 4},
            timeout=300,
        )
        assert out["error_code"] == 0
        assert isinstance(out["text"], str)
        assert np.asarray(out["pred_hands"]).shape == (1, 2, 4, 2)

        # streamed: \0-delimited accumulated-text chunks, final carries the traj
        req = urllib.request.Request(
            f"http://127.0.0.1:{w_port}/worker_generate_stream",
            json.dumps({"prompt": "Where?", "max_new_tokens": 4}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            chunks = [json.loads(c) for c in r.read().split(b"\0") if c]
        assert len(chunks) >= 2  # at least one per-token chunk + the final
        assert all(c["error_code"] == 0 for c in chunks)
        texts = [c["text"] for c in chunks]
        assert all(texts[i + 1].startswith(texts[i]) for i in range(len(texts) - 2))
        assert chunks[-1].get("finish") and "pred_hands" in chunks[-1]
        assert np.asarray(chunks[-1]["pred_hands"]).shape == (1, 2, 4, 2)

        # web UI: page, model list, generate proxy
        web = f"http://127.0.0.1:{web_port}"
        with urllib.request.urlopen(web + "/", timeout=10) as r:
            assert b"HandsOnVLM" in r.read()
        assert _post(web + "/list_models", {})["models"] == ["handsonvlm-tiny"]
        req = urllib.request.Request(
            web + "/generate",
            json.dumps({"model": "handsonvlm-tiny", "prompt": "Hi", "max_new_tokens": 3}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            chunks = [json.loads(c) for c in r.read().split(b"\0") if c]
        assert chunks and chunks[-1].get("finish")

        # unknown model through the proxy -> clean 503
        req = urllib.request.Request(
            web + "/generate", json.dumps({"model": "nope", "prompt": "x"}).encode(),
            {"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
    finally:
        web_server.shutdown()
        w_server.shutdown()
        ctrl_server.shutdown()
        worker.stop()
        controller.stop()


def test_multiturn_history_and_vote_logging(tmp_path):
    """Multi-turn chat state + vote/conversation logs (the reference
    gradio_web_server's conversation state, vote_last_response, and
    {date}-conv.json logging)."""
    import os

    from handsonvlm_tpu.serve.model_worker import ModelWorker, serve_worker
    from handsonvlm_tpu.serve.web_server import serve_web

    controller, ctrl_server = serve_controller("127.0.0.1", 0)
    ctrl_port = ctrl_server.server_address[1]
    threading.Thread(target=ctrl_server.serve_forever, daemon=True).start()
    ctrl_addr = f"http://127.0.0.1:{ctrl_port}"
    worker = ModelWorker(
        ctrl_addr, "http://127.0.0.1:0", "random:tiny", preset="tiny",
        model_name="handsonvlm-tiny",
    )
    w_server = serve_worker(worker, "127.0.0.1", 0)
    w_port = w_server.server_address[1]
    threading.Thread(target=w_server.serve_forever, daemon=True).start()
    worker.worker_addr = f"http://127.0.0.1:{w_port}"
    worker.register()
    web_server = serve_web(ctrl_addr, "127.0.0.1", 0, logdir=str(tmp_path))
    web_port = web_server.server_address[1]
    threading.Thread(target=web_server.serve_forever, daemon=True).start()
    web = f"http://127.0.0.1:{web_port}"
    try:
        # turn-2 request carries turn-1 history; the worker renders both
        # turns into the v1 template (engine.build_prompt_ids)
        out = _post(
            f"http://127.0.0.1:{w_port}/worker_generate",
            {"prompt": "And after that?", "max_new_tokens": 3,
             "history": [["Where should my hand move?", "To the cup."]]},
            timeout=300,
        )
        assert out["error_code"] == 0

        # the prompt with history must be strictly longer than without
        from handsonvlm_tpu.eval.evaluator import InferenceEngine

        eng = worker.engine
        plain = eng.build_prompt_ids("And after that?")
        multi = eng.build_prompt_ids(
            "And after that?", history=[("Where should my hand move?", "To the cup.")]
        )
        assert multi.shape[1] > plain.shape[1]
        # <image> sentinel appears exactly once, on the first turn
        assert (multi == -200).sum() == 1

        # vote logging
        _post(web + "/vote", {"type": "upvote", "model": "handsonvlm-tiny",
                              "history": [["q", "a"]]})
        logs = [f for f in os.listdir(tmp_path) if f.endswith("-conv.json")]
        assert logs, os.listdir(tmp_path)
        records = [
            json.loads(line)
            for line in open(os.path.join(tmp_path, logs[0]))
        ]
        assert any(r["type"] == "upvote" for r in records)
        assert all("tstamp" in r for r in records)
    finally:
        web_server.shutdown()
        w_server.shutdown()
        ctrl_server.shutdown()
        worker.stop()
        controller.stop()


def test_worker_healthz_early_bind():
    """The worker binds + answers /healthz before the model loads; generate
    endpoints 503 while loading and work after load()."""
    from handsonvlm_tpu.serve.model_worker import ModelWorker, serve_worker

    worker = ModelWorker(
        None, "http://127.0.0.1:0", "random:tiny", preset="tiny",
        defer_load=True,
    )
    w_server = serve_worker(worker, "127.0.0.1", 0)
    w_port = w_server.server_address[1]
    threading.Thread(target=w_server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{w_port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "loading"
        try:
            _post(base + "/worker_generate", {"prompt": "x"}, timeout=10)
            assert False, "expected 503 while loading"
        except urllib.error.HTTPError as e:
            assert e.code == 503
        worker.load()
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ready"
        out = _post(base + "/worker_generate",
                    {"prompt": "Where?", "max_new_tokens": 2}, timeout=300)
        assert out["error_code"] == 0
    finally:
        w_server.shutdown()
        worker.stop()


def test_worker_dynamic_batching():
    """Concurrent requests co-schedule into fewer decode batches."""
    from concurrent.futures import ThreadPoolExecutor

    from handsonvlm_tpu.serve.model_worker import ModelWorker, serve_worker

    worker = ModelWorker(
        None, "http://127.0.0.1:0", "random:tiny", preset="tiny",
        max_batch=4, batch_wait_ms=200.0,
    )
    w_server = serve_worker(worker, "127.0.0.1", 0)
    w_port = w_server.server_address[1]
    threading.Thread(target=w_server.serve_forever, daemon=True).start()
    try:
        # warm the compile with one request so the batch window isn't
        # consumed by compilation
        _post(f"http://127.0.0.1:{w_port}/worker_generate",
              {"prompt": "warm", "max_new_tokens": 4}, timeout=300)
        base = worker.batcher.batches_run

        def ask(i):
            return _post(
                f"http://127.0.0.1:{w_port}/worker_generate",
                {"prompt": f"request {i}", "max_new_tokens": 4}, timeout=300,
            )

        with ThreadPoolExecutor(4) as pool:
            outs = list(pool.map(ask, range(4)))
        for out in outs:
            assert out["error_code"] == 0
            assert np.asarray(out["pred_hands"]).shape == (1, 2, 4, 2)
        ran = worker.batcher.batches_run - base
        assert worker.batcher.requests_served >= 5
        assert ran < 4, f"expected co-scheduling, got {ran} batches for 4 requests"
    finally:
        w_server.shutdown()
        worker.stop()


def _make_adapter_dir(tmpdir, cfg, name, seed, r=4):
    """Write a LoRA adapter artifact with nonzero B so it shifts logits."""
    import jax
    import jax.numpy as jnp

    from handsonvlm_tpu.core.checkpoint import save_artifact
    from handsonvlm_tpu.models.lora import init_lora

    lora = init_lora(jax.random.PRNGKey(seed), cfg.llama, r=r, alpha=8.0)
    lora["adapters"] = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(seed + 1), x.shape, x.dtype)
        if x.ndim == 3 else x,
        lora["adapters"],
    )
    path = f"{tmpdir}/{name}"
    save_artifact(path, "lora", lora, meta={"base": "random:tiny"})
    return path


def test_lora_hot_swap(tmp_path):
    """Worker serves base + per-request LoRA adapters from one resident model:
    adapters advertised as `<model>:<adapter>` names, requests routed by
    `lora` field or model suffix, adapter changes the sampled output, and the
    batcher never mixes adapters in one decode batch."""
    import jax

    from handsonvlm_tpu.serve.lora_registry import LoraRegistry
    from handsonvlm_tpu.serve.model_worker import ModelWorker, serve_worker

    worker = ModelWorker(
        None, "http://127.0.0.1:0", "random:tiny", preset="tiny",
        model_name="tiny", max_batch=4, batch_wait_ms=150.0, defer_load=True,
    )
    # adapters need the loaded cfg — load the base first, then the dir
    worker._load_args = worker._load_args[:5] + (None, 4, 0, None) + worker._load_args[9:]
    worker.load()
    cfg = worker.cfg
    _make_adapter_dir(tmp_path, cfg, "styleA", seed=7)
    _make_adapter_dir(tmp_path, cfg, "styleB", seed=99)
    worker.lora = LoraRegistry(str(tmp_path), max_resident=1)
    assert worker.lora.names == ["styleA", "styleB"]
    assert worker._model_names() == ["tiny", "tiny:styleA", "tiny:styleB"]

    # adapter changes the decode output at identical rng
    engine = worker.engine
    frames = np.zeros(
        (1, cfg.num_frames, 3, cfg.vision.image_size, cfg.vision.image_size), np.float32
    )
    rng = jax.random.PRNGKey(0)
    base_pred, _, base_ids = engine.infer("Where?", frames, rng)
    pa = worker.lora.params_for(engine.params, "styleA")
    a_pred, _, a_ids = engine.infer("Where?", frames, rng, params=pa)
    assert (list(a_ids) != list(base_ids)) or not np.allclose(base_pred, a_pred, atol=1e-3)
    # base params dict untouched by the overlay
    assert "lora" not in engine.params

    # LRU: capacity 1 -> loading the second adapter evicts the first
    worker.lora.params_for(engine.params, "styleB")
    assert worker.lora.evictions == 1

    w_server = serve_worker(worker, "127.0.0.1", 0)
    w_port = w_server.server_address[1]
    threading.Thread(target=w_server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{w_port}/worker_generate"
        out = _post(url, {"prompt": "hi", "lora": "styleA", "max_new_tokens": 3}, timeout=300)
        assert out["error_code"] == 0
        # adapter via model-name suffix (web-UI dropdown path)
        out = _post(url, {"prompt": "hi", "model": "tiny:styleB", "max_new_tokens": 3}, timeout=300)
        assert out["error_code"] == 0
        # unknown adapter -> clean 500, not a hang
        try:
            _post(url, {"prompt": "hi", "lora": "nope", "max_new_tokens": 3}, timeout=60)
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500

        # batcher groups by adapter: concurrent mixed-adapter requests run
        # in >= 2 decode batches (one per adapter), all succeed
        from concurrent.futures import ThreadPoolExecutor

        base_batches = worker.batcher.batches_run

        def ask(i):
            lora = ["styleA", "styleB"][i % 2]
            return _post(url, {"prompt": f"q{i}", "lora": lora, "max_new_tokens": 3}, timeout=300)

        with ThreadPoolExecutor(4) as pool:
            outs = list(pool.map(ask, range(4)))
        assert all(o["error_code"] == 0 for o in outs)
        assert worker.batcher.batches_run - base_batches >= 2
    finally:
        w_server.shutdown()
        worker.stop()


def test_worker_spec_decode():
    """--spec worker: unbatched requests decode speculatively (engine
    routes B=1 through generate_spec) and return the normal payload."""
    from handsonvlm_tpu.serve.model_worker import ModelWorker, serve_worker

    worker = ModelWorker(
        None, "http://127.0.0.1:0", "random:tiny", preset="tiny", spec_k=2,
    )
    w_server = serve_worker(worker, "127.0.0.1", 0)
    w_port = w_server.server_address[1]
    threading.Thread(target=w_server.serve_forever, daemon=True).start()
    try:
        out = _post(
            f"http://127.0.0.1:{w_port}/worker_generate",
            {"prompt": "Where should my hand move?", "max_new_tokens": 5},
            timeout=300,
        )
        assert out["error_code"] == 0
        assert np.asarray(out["pred_hands"]).shape == (1, 2, 4, 2)

        # streamed variant: burst streaming from the speculative chunks
        req = urllib.request.Request(
            f"http://127.0.0.1:{w_port}/worker_generate_stream",
            json.dumps({"prompt": "Where?", "max_new_tokens": 6}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            chunks = [json.loads(c) for c in r.read().split(b"\0") if c]
        assert chunks and chunks[-1].get("finish")
        assert all(c["error_code"] == 0 for c in chunks)
        texts = [c["text"] for c in chunks[:-1]]
        assert all(texts[i + 1].startswith(texts[i]) for i in range(len(texts) - 1))
    finally:
        w_server.shutdown()
        worker.stop()


def test_worker_spec_with_lora(tmp_path):
    """Speculative decode composes with per-request LoRA hot-swap: the
    B=1 spec path receives the adapter-augmented params."""
    from handsonvlm_tpu.serve.lora_registry import LoraRegistry
    from handsonvlm_tpu.serve.model_worker import ModelWorker, serve_worker

    worker = ModelWorker(
        None, "http://127.0.0.1:0", "random:tiny", preset="tiny",
        model_name="tiny", spec_k=2, defer_load=True,
    )
    worker._load_args = worker._load_args[:5] + (None, 4, 2, None) + worker._load_args[9:]
    worker.load()
    _make_adapter_dir(tmp_path, worker.cfg, "styleA", seed=11)
    worker.lora = LoraRegistry(str(tmp_path))
    w_server = serve_worker(worker, "127.0.0.1", 0)
    w_port = w_server.server_address[1]
    threading.Thread(target=w_server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{w_port}/worker_generate"
        out = _post(url, {"prompt": "hi", "lora": "styleA", "max_new_tokens": 4},
                    timeout=300)
        assert out["error_code"] == 0
        base = _post(url, {"prompt": "hi", "max_new_tokens": 4}, timeout=300)
        assert base["error_code"] == 0
    finally:
        w_server.shutdown()
        worker.stop()


def test_remove_worker_and_proxy_retry():
    """A stale registry entry (worker re-registered under a new address)
    must not 502 the web proxy: it reports the ghost via /remove_worker and
    retries with a fresh pick."""
    controller, ctrl_server = serve_controller("127.0.0.1", 0)
    ctrl_port = ctrl_server.server_address[1]
    threading.Thread(target=ctrl_server.serve_forever, daemon=True).start()
    ctrl_addr = f"http://127.0.0.1:{ctrl_port}"

    status = {"model_names": ["m"], "speed": 1, "queue_length": 0}
    assert _post(ctrl_addr + "/register_worker",
                 {"worker_name": "http://127.0.0.1:1", "worker_status": status})["ok"]
    assert _post(ctrl_addr + "/remove_worker",
                 {"worker_name": "http://127.0.0.1:1"})["ok"]
    assert not _post(ctrl_addr + "/remove_worker",
                     {"worker_name": "http://127.0.0.1:1"})["ok"]
    assert _post(ctrl_addr + "/get_worker_address", {"model": "m"})["address"] == ""
    ctrl_server.shutdown()
