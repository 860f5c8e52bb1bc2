"""Model worker: serves generate requests, heartbeats to the controller.

Behavioral spec from `llava/serve/model_worker.py:36-282`: register with the
controller on start, heartbeat every 15 s with the current queue length,
bound concurrency with a semaphore, expose status + generate endpoints.
stdlib http server (no fastapi in this environment).

Endpoints:
  /worker_get_status  -> {model_names, speed, queue_length}
  /worker_generate    {prompt, image_b64?, temperature, top_p,
                       max_new_tokens} -> {text, pred_hands, num_hands}
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from handsonvlm_tpu.serve.controller import WORKER_HEART_BEAT_INTERVAL


def _post(url: str, payload: dict, timeout: float = 5.0) -> dict:
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


class ModelWorker:
    def __init__(
        self,
        controller_addr: Optional[str],
        worker_addr: str,
        model_path: str,
        preset: str = "7b",
        model_name: Optional[str] = None,
        limit_concurrency: int = 2,
        max_batch: int = 1,
        batch_wait_ms: float = 30.0,
        quantize: Optional[str] = None,
        defer_load: bool = False,
        lora_dir: Optional[str] = None,
        lora_resident: int = 4,
        spec_k: int = 0,
        kv_quant=None,
        continuous_slots: int = 0,
        continuous_max_len: int = 4096,
        ttft_slo=None,
        admit_hold_s: float = 0.0,
    ):
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.model_name = model_name or model_path.rstrip("/").split("/")[-1]
        # batching needs enough concurrent requests in flight to co-schedule
        self.semaphore = threading.Semaphore(
            max(limit_concurrency, max_batch, continuous_slots))
        self.queue_length = 0
        self.lock = threading.Lock()
        self._stop = threading.Event()
        self.ready = False
        self._load_args = (
            model_path, preset, quantize, max_batch, batch_wait_ms,
            lora_dir, lora_resident, spec_k, kv_quant,
            continuous_slots, continuous_max_len, ttft_slo, admit_hold_s,
        )
        if not defer_load:
            self.load()

    def load(self):
        """Build the engine, then register. With ``defer_load=True`` the HTTP
        server (and /healthz) can bind *before* this runs, so operators can
        distinguish "loading" from "dead" during the minutes-long model load
        (ROADMAP round-1 item; the reference worker binds only after load)."""
        (model_path, preset, quantize, max_batch, batch_wait_ms,
         lora_dir, lora_resident, spec_k, kv_quant,
         continuous_slots, continuous_max_len, ttft_slo,
         admit_hold_s) = self._load_args

        from handsonvlm_tpu.eval.evaluator import InferenceEngine
        from handsonvlm_tpu.infer.builder import load_pretrained_model

        params, cfg, tokenizer = load_pretrained_model(model_path, preset, quantize=quantize)
        self.engine = InferenceEngine(
            params=params, cfg=cfg, tokenizer=tokenizer, spec_k=spec_k,
            kv_quant=kv_quant,
        )
        self.cfg = cfg
        self._seed = 0
        self.lora = None
        if lora_dir:
            import jax.numpy as jnp

            from handsonvlm_tpu.serve.lora_registry import LoraRegistry

            self.lora = LoraRegistry(lora_dir, max_resident=lora_resident, cast=jnp.bfloat16)
            print(f"lora adapters: {self.lora.names}")
        self.batcher = None
        if max_batch > 1:
            from handsonvlm_tpu.serve.batcher import DynamicBatcher

            # batched (B>1) decode at 7B bf16 OOMs a 16 GB chip: XLA inserts
            # 3 GB of transposed-layout copies of the stacked qkv weights
            # (docs/PERF_NOTES.md; tools/perf_layout_probe.py). int8 weights
            # shrink the copies 4x and fit — use --int8 for batched serving.
            if quantize is None and cfg.llama.hidden_size >= 4096:
                print(
                    "warning: batched decode with bf16 weights at 7B+ can "
                    "OOM a 16 GB chip (XLA layout copies); prefer --int8"
                )
            self.batcher = DynamicBatcher(
                self.engine, max_batch=max_batch, max_wait_ms=batch_wait_ms
            )
        self.scheduler = None
        if continuous_slots > 0:
            from handsonvlm_tpu.serve.scheduler import ContinuousScheduler

            # same 16 GB caveat as dynamic batching: slots>1 decode at 7B+
            # bf16 triggers XLA layout copies — quantized weights recommended
            if quantize is None and cfg.llama.hidden_size >= 4096:
                print(
                    "warning: continuous batching with bf16 weights at 7B+ "
                    "can OOM a 16 GB chip (XLA layout copies); prefer --int8"
                )
            self.scheduler = ContinuousScheduler(
                params, cfg, slots=continuous_slots,
                max_len=continuous_max_len, kv_quant=kv_quant,
                ttft_slo=ttft_slo, admit_hold_s=admit_hold_s,
            )

        self.ready = True
        if self.controller_addr:
            self.register()
            self._hb = threading.Thread(target=self._heartbeat_loop, daemon=True)
            self._hb.start()

    def health(self) -> dict:
        return {
            "status": "ready" if self.ready else "loading",
            "model_names": [self.model_name],
        }

    def _model_names(self) -> list:
        """Base name plus one `<base>:<adapter>` alias per LoRA adapter, so
        the controller routes adapter-qualified model requests here and the
        web UI's model dropdown lists every adapter."""
        names = [self.model_name]
        if getattr(self, "lora", None) is not None:
            names += [f"{self.model_name}:{a}" for a in self.lora.names]
        return names

    def status(self) -> dict:
        out = {
            "model_names": self._model_names(),
            "speed": 1,
            "queue_length": self.queue_length,
        }
        if self.scheduler is not None:
            # continuous-batching telemetry: cache-defrag events and
            # time-to-first-token percentiles over this worker's lifetime
            eng = self.scheduler.engine
            tt = sorted(self.scheduler.ttfts)
            out["continuous"] = {
                "slots": eng.b,
                "live": sum(s.busy for s in eng.slots),
                "cursor": eng.pos,
                "max_len": eng.s,
                "compactions": eng.compactions,
                "requests": len(tt),
                "ttft_p50_s": round(tt[len(tt) // 2], 3) if tt else None,
                "ttft_max_s": round(tt[-1], 3) if tt else None,
            }
        return out

    def _request_params(self, payload: dict):
        """Resolve the per-request params dict: explicit `lora` field, else a
        `<model>:<adapter>` qualified model name, else the base params."""
        name = payload.get("lora")
        if not name:
            model = payload.get("model", "")
            if ":" in model:
                name = model.split(":", 1)[1]
        if not name or name == "base" or self.lora is None:
            return self.engine.params, None
        return self.lora.params_for(self.engine.params, name), name

    def register(self):
        _post(
            self.controller_addr + "/register_worker",
            {
                "worker_name": self.worker_addr,
                "check_heart_beat": True,
                "worker_status": self.status(),
            },
        )

    def _heartbeat_loop(self):
        while not self._stop.wait(WORKER_HEART_BEAT_INTERVAL):
            try:
                r = _post(
                    self.controller_addr + "/receive_heart_beat",
                    {"worker_name": self.worker_addr, "queue_length": self.queue_length},
                )
                if not r.get("exist"):
                    self.register()
            except Exception as e:  # noqa: BLE001 — keep heartbeating
                print(f"heartbeat error: {e}")

    def stop(self):
        self._stop.set()
        if getattr(self, "batcher", None) is not None:
            self.batcher.stop()
        if getattr(self, "scheduler", None) is not None:
            self.scheduler.stop()

    def _frames(self, payload: dict) -> np.ndarray:
        if payload.get("image_b64"):
            from PIL import Image

            from handsonvlm_tpu.data.video_io import clip_preprocess

            img = Image.open(io.BytesIO(base64.b64decode(payload["image_b64"])))
            frame = clip_preprocess(img)
            return np.tile(frame[None], (self.cfg.num_frames, 1, 1, 1))
        return np.zeros(
            (self.cfg.num_frames, 3, self.cfg.vision.image_size, self.cfg.vision.image_size),
            np.float32,
        )

    def _request_options(self, payload: dict):
        """Per-request decode options as locals — NEVER mutate the shared
        engine attributes: the semaphore admits several concurrent request
        threads (--continuous / --batch), so a shared-attribute write could
        leak one request's options into another in-flight request."""
        return (
            float(payload.get("temperature", 0.5)),
            float(payload.get("top_p", 0.9)),
            int(payload.get("max_new_tokens", 100)),
        )

    def _next_seed(self) -> int:
        """Atomic seed draw (read-modify-write under the lock): concurrent
        requests must not sample with the same seed."""
        with self.lock:
            self._seed += 1
            return self._seed

    def _generate_continuous(self, payload: dict, frames, seed: int,
                             on_tokens=None):
        """Submit one request to the continuous-batching scheduler and wait.
        Returns (pred, valid, gen_ids) shaped like InferenceEngine.infer."""
        from handsonvlm_tpu.eval.evaluator import InferenceEngine
        from handsonvlm_tpu.infer.sampler import clip_pred_hands

        ids = self.engine.build_prompt_ids(
            payload["prompt"],
            history=[tuple(t) for t in payload.get("history", [])],
        )
        import jax.numpy as jnp

        images, frame_map = InferenceEngine.dedup_frames(frames[None])
        slo = payload.get("ttft_slo")  # seconds; None = no deadline
        out = self.scheduler.submit(
            ids, jnp.asarray(images, self.cfg.cdtype), seed=seed,
            max_new=int(payload.get("max_new_tokens", 100)),
            temperature=float(payload.get("temperature", 0.5)),
            top_p=float(payload.get("top_p", 0.9)),
            frame_map=frame_map, on_tokens=on_tokens,
            ttft_slo=None if slo is None else float(slo),
        )
        pred, valid = clip_pred_hands(
            np.asarray(out.pred_hands), np.asarray(out.num_hands)
        )
        n = int(out.num_tokens[0])
        return pred, valid, np.asarray(out.sequences[0, :n])

    def generate(self, payload: dict) -> dict:
        import jax

        with self.lock:
            self.queue_length += 1
        self.semaphore.acquire()
        try:
            frames = self._frames(payload)
            temperature, top_p, max_new = self._request_options(payload)
            seed = self._next_seed()
            params, lora_name = self._request_params(payload)
            if self.scheduler is not None and lora_name is None:
                # shared decode batch; LoRA-qualified requests fall through
                # to the solo path (the scheduler's engine holds base params)
                pred, valid, gen_ids = self._generate_continuous(
                    payload, frames, seed)
            elif self.batcher is not None:
                pred_row, valid_row, gen_ids = self.batcher.submit(
                    payload["prompt"], frames, seed,
                    lora=lora_name, params=params,
                )
                pred, valid = pred_row[None], np.asarray([valid_row])
            else:
                pred, valid, gen_ids = self.engine.infer(
                    payload["prompt"], frames[None], jax.random.PRNGKey(seed),
                    params=params,
                    history=[tuple(t) for t in payload.get("history", [])],
                    temperature=temperature, top_p=top_p,
                    max_new_tokens=max_new,
                )
            text = (
                self.engine.tokenizer.decode(gen_ids)
                if hasattr(self.engine.tokenizer, "decode")
                else ""
            )
            return {
                "text": text,
                "pred_hands": pred.tolist(),
                "trajectory_valid": bool(valid[0]),
                "error_code": 0,
            }
        finally:
            self.semaphore.release()
            with self.lock:
                self.queue_length -= 1

    def generate_stream(self, payload: dict):
        """Yield accumulated-text dicts per sampled token, then a final dict
        with the decoded trajectory.

        Protocol matches the reference worker's generate_stream
        (llava/serve/model_worker.py:128-180): each yielded dict carries the
        full text so far + error_code 0; consumers split on b'\\0'. Driven by
        the host decode loop's on_token hook (one jitted step per token)."""
        import queue as queue_mod

        import jax

        from handsonvlm_tpu.data.tokenization import tokenizer_image_token
        from handsonvlm_tpu.infer.sampler import clip_pred_hands, generate_host

        with self.lock:
            self.queue_length += 1
        self.semaphore.acquire()
        try:
            frames = self._frames(payload)
            temperature, top_p, max_new = self._request_options(payload)
            seed = self._next_seed()
            req_params, lora_name = self._request_params(payload)
            if self.scheduler is not None and lora_name is None:
                # continuous batching: chunk-boundary streaming (tokens
                # arrive in bursts of <= chunk per dispatch)
                q: queue_mod.Queue = queue_mod.Queue()
                decode = self.engine.tokenizer.decode
                pieces = []

                def on_tokens(tok_ids):
                    pieces.extend(int(t) for t in tok_ids)
                    q.put({"text": decode(pieces), "error_code": 0})

                def run_cont():
                    from handsonvlm_tpu.serve.scheduler import SLORejected
                    try:
                        pred, valid, _gen = self._generate_continuous(
                            payload, frames, seed, on_tokens=on_tokens)
                        q.put({
                            "text": decode(pieces),
                            "pred_hands": pred.tolist(),
                            "trajectory_valid": bool(valid[0]),
                            "error_code": 0,
                            "finish": True,
                        })
                    except SLORejected as e:
                        # load shed, not failure: error_code 3 matches the
                        # non-stream path's 429 so streaming clients can
                        # retry elsewhere (--ttft-slo help text)
                        q.put({"error": str(e), "error_code": 3, "finish": True})
                    except Exception as e:  # noqa: BLE001
                        q.put({"error": str(e), "error_code": 1, "finish": True})
                    q.put(None)

                threading.Thread(target=run_cont, daemon=True).start()
                while True:
                    item = q.get()
                    if item is None:
                        return
                    yield item
            ids = self.engine.build_prompt_ids(
                payload["prompt"],
                history=[tuple(t) for t in payload.get("history", [])],
            )
            # LEFT-pad to the engine's bucket size: one prefill compile per
            # bucket instead of one per prompt length (see InferenceEngine.infer)
            t = ids.shape[1]
            m = self.engine.pad_prompt_multiple
            bucket = ((t + m - 1) // m) * m
            attn = np.ones((1, bucket), bool)
            if bucket != t:
                pad = np.full((1, bucket - t), self.engine.tokenizer.pad_token_id, np.int64)
                ids = np.concatenate([pad, ids], axis=1)
                attn[:, : bucket - t] = False
            q: queue_mod.Queue = queue_mod.Queue()
            decode = self.engine.tokenizer.decode
            pieces = []

            def on_token(tok_id: int):
                pieces.append(tok_id)
                q.put({"text": decode(pieces), "error_code": 0})

            from handsonvlm_tpu.data.conversation import conv_templates

            conv = conv_templates[self.engine.conv_mode]
            stop_str = conv.sep2 if conv.sep2 else conv.sep

            def run():
                try:
                    if self.engine.spec_k > 0:
                        # speculative streaming: tokens arrive in bursts of
                        # up to chunk_iters*(k+1) per dispatch
                        from handsonvlm_tpu.infer.speculative import (
                            build_template_bank,
                            generate_spec,
                        )

                        if not hasattr(self.engine, "_spec_bank"):
                            self.engine._spec_bank = build_template_bank(
                                self.engine.tokenizer, self.cfg
                            )
                        out, _stats = generate_spec(
                            req_params, self.cfg, ids, frames[None],
                            jax.random.PRNGKey(seed),
                            max_new_tokens=max_new,
                            k=self.engine.spec_k, chunk_iters=2,
                            temperature=temperature,
                            top_p=top_p, attn_mask=attn,
                            bank_ids=self.engine._spec_bank,
                            on_token=on_token,
                        )
                    else:
                        out = generate_host(
                            req_params, self.cfg, ids, frames[None],
                            jax.random.PRNGKey(seed),
                            max_new_tokens=max_new,
                            temperature=temperature,
                            top_p=top_p, attn_mask=attn,
                            on_token=on_token,
                            stop_strs=[stop_str] if stop_str else None,
                            tokenizer=self.engine.tokenizer,
                        )
                    pred, valid = clip_pred_hands(
                        np.asarray(out.pred_hands), np.asarray(out.num_hands)
                    )
                    q.put({
                        "text": decode(pieces),
                        "pred_hands": pred.tolist(),
                        "trajectory_valid": bool(valid[0]),
                        "error_code": 0,
                        "finish": True,
                    })
                except Exception as e:  # noqa: BLE001 — surface to the client
                    q.put({"error": str(e), "error_code": 1, "finish": True})
                q.put(None)

            t = threading.Thread(target=run, daemon=True)
            t.start()
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            self.semaphore.release()
            with self.lock:
                self.queue_length -= 1


def serve_worker(worker: ModelWorker, host: str, port: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _stream(self, chunks):
            """Chunked transfer encoding; each item is JSON + b'\\0'
            (the reference's llava/serve worker stream protocol)."""
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                for item in chunks:
                    body = json.dumps(item).encode() + b"\0"
                    self.wfile.write(f"{len(body):x}\r\n".encode() + body + b"\r\n")
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                chunks.close()  # client went away; run the generator's finally
                return
            self.wfile.write(b"0\r\n\r\n")

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, worker.health())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            data = json.loads(self.rfile.read(length) or b"{}")
            if self.path == "/healthz":
                self._json(200, worker.health())
            elif self.path == "/worker_get_status":
                self._json(200, worker.status())
            elif self.path in ("/worker_generate", "/worker_generate_stream") and not worker.ready:
                self._json(503, {"error": "model loading", "error_code": 2})
            elif self.path == "/worker_generate":
                from handsonvlm_tpu.serve.scheduler import SLORejected

                try:
                    self._json(200, worker.generate(data))
                except SLORejected as e:
                    # load shed: the client should retry elsewhere / later
                    self._json(429, {"error": str(e), "error_code": 3})
                except Exception as e:  # noqa: BLE001
                    self._json(500, {"error": str(e), "error_code": 1})
            elif self.path == "/worker_generate_stream":
                self._stream(worker.generate_stream(data))
            else:
                self._json(404, {"error": "unknown path"})

    return ThreadingHTTPServer((host, port), Handler)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=40000)
    p.add_argument("--controller", default="http://localhost:10000")
    p.add_argument("--worker-address", default=None)
    p.add_argument("--model-path", required=True)
    p.add_argument("--preset", default="7b")
    p.add_argument("--limit-model-concurrency", type=int, default=2)
    p.add_argument("--max-batch", type=int, default=1,
                   help=">1 enables dynamic request batching (serve/batcher.py)")
    p.add_argument("--batch-wait-ms", type=float, default=30.0)
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder (recommended with --max-batch)")
    p.add_argument("--int4", action="store_true",
                   help="int4 group-wise weight-only decoder")
    p.add_argument("--lora-dir", default=None,
                   help="directory of LoRA adapter subdirs to hot-swap per "
                        "request (serve/lora_registry.py)")
    p.add_argument("--lora-resident", type=int, default=4,
                   help="max adapters resident in HBM at once (LRU)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8-quantized KV cache (halves decode-attention "
                        "DMA and cache HBM; exact per-token dequant)")
    p.add_argument("--spec", type=int, default=0, metavar="K",
                   help="speculative decode for unbatched requests "
                        "(K-token drafts; infer/speculative.py)")
    p.add_argument("--continuous", type=int, default=0, metavar="SLOTS",
                   help=">0 enables continuous batching: SLOTS requests "
                        "share one decode batch, joining/leaving at chunk "
                        "boundaries (serve/continuous.py); takes precedence "
                        "over --max-batch for non-LoRA requests")
    p.add_argument("--continuous-max-len", type=int, default=4096,
                   help="shared-cache length budget for --continuous "
                        "(prompt buckets + decode chunks of every "
                        "concurrently admitted request)")
    p.add_argument("--admit-hold", type=float, default=0.0, metavar="SECONDS",
                   help="idle-engine burst coalescing for --continuous: "
                        "wait up to this long for more arrivals before the "
                        "first join so a burst prefills as ONE full-width "
                        "fused dispatch (recommended ~0.25 for batch-style "
                        "traffic; 0 keeps latency-first admission)")
    p.add_argument("--ttft-slo", type=float, default=None, metavar="SECONDS",
                   help="first-token latency SLO for --continuous: reject "
                        "(HTTP 429) any request whose estimated TTFT "
                        "exceeds it instead of queueing; per-request "
                        "'ttft_slo' in the payload overrides")
    args = p.parse_args()
    addr = args.worker_address or f"http://localhost:{args.port}"
    worker = ModelWorker(
        args.controller, addr, args.model_path, args.preset,
        limit_concurrency=args.limit_model_concurrency,
        max_batch=args.max_batch, batch_wait_ms=args.batch_wait_ms,
        quantize="int8" if args.int8 else ("int4" if args.int4 else None),
        defer_load=True,
        lora_dir=args.lora_dir, lora_resident=args.lora_resident,
        spec_k=args.spec,
        kv_quant="int8" if args.kv_int8 else None,
        continuous_slots=args.continuous,
        continuous_max_len=args.continuous_max_len,
        ttft_slo=args.ttft_slo,
        admit_hold_s=args.admit_hold,
    )
    # bind + serve /healthz immediately; generate endpoints 503 until loaded
    server = serve_worker(worker, args.host, args.port)
    print(f"worker {addr} bound (loading {worker.model_name})")
    threading.Thread(target=server.serve_forever, daemon=True).start()
    worker.load()
    print(f"worker {addr} serving {worker.model_name}")
    threading.Event().wait()


if __name__ == "__main__":
    main()
