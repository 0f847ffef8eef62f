"""Serving: model-container handler + async HTTP control plane.

Two layers, mirroring the reference's serving stack (SURVEY.md §3.4):

1. `InferenceHandler` — the model-container contract of
   moegan/inference.py: model_fn/transform_fn/handle(data, context) with
   the request schema {text, num_samples<=4, truncation_psi,
   calculate_fid} and response {images: [b64 png], prompt, fid_score?}
   (:252-357). Checkpoint discovery searches the model dir for a saved
   model with wrapped/bare tolerance (:24-118).

2. `serve()` — a local HTTP control plane replacing API Gateway + the 5
   Lambdas + DynamoDB (cloudformation.yaml:123-1517): POST /generate ->
   {request_id}, GET /poll?request_id -> {status, data}, POST
   /image-metrics (FID path), GET /metrics -> model_metrics.json. Jobs run
   on a worker thread with an in-memory TTL store — the same asynchronous
   poll-loop shape the frontend expects (frontend/index.html:281-429).
"""

from __future__ import annotations

import base64
import io
import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from moegan_tpu.config import GeneratorConfig
from moegan_tpu.infer.fid import FIDEvaluator
from moegan_tpu.infer.sample import Sampler, expert_utilization_stats

MAX_NUM_SAMPLES = 4  # ref inference.py:283 caps at 4

# Default-seed stream: the reference seeds from time (inference.py:209
# analog) which collides for same-second concurrent requests — identical
# images for identical prompts. A urandom base + atomic counter keeps
# every request's default seed unique within the process.
_SEED_BASE = int.from_bytes(os.urandom(4), "little")
_SEED_COUNTER = __import__("itertools").count()


def next_default_seed() -> int:
    """Process-unique default seed (urandom base + atomic counter)."""
    return (_SEED_BASE + next(_SEED_COUNTER)) % (2**31)


def images_to_b64_pngs(images_m11: np.ndarray) -> list[str]:
    """[-1,1] NHWC float -> list of base64 PNG strings (ref :323-340)."""
    from PIL import Image

    out = []
    arr = np.clip((np.asarray(images_m11) + 1.0) * 127.5, 0, 255).astype(np.uint8)
    for img in arr:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        out.append(base64.b64encode(buf.getvalue()).decode("utf-8"))
    return out


def find_model_file(model_dir: str) -> Optional[str]:
    """Search for a saved model like reference load_model (:34-105):
    canonical name first, then any matching file incl. subdirs."""
    canonical = os.path.join(model_dir, "aurora_model_final.msgpack")
    if os.path.exists(canonical):
        return canonical
    for root, _, files in os.walk(model_dir):
        for f in sorted(files):
            if f.endswith((".msgpack", ".npz")):
                return os.path.join(root, f)
    for root, dirs, _ in os.walk(model_dir):
        for d in sorted(dirs):
            if d == "default" or d.isdigit():
                return os.path.join(root, d)
    return None


class MicroBatcher:
    """Dynamic request batching for the TPU generate path.

    Concurrent /generate requests land in a queue; a single dispatcher
    thread coalesces up to `slots` requests (waiting at most
    `max_wait_s` after the first) into ONE fixed-shape generator
    dispatch of slots*samples_per_req images — per-request seeds drive
    the z slices and a traced per-sample psi vector carries each
    request's truncation, so every mix of requests reuses one compiled
    program. Under-full batches are padded (padding slots reuse slot 0's
    inputs and are discarded). This is the TPU-native replacement for
    the reference's one-Lambda-invocation-per-request fan-out: batch=1
    generation leaves the MXU nearly idle, so coalescing multiplies
    serving throughput at a bounded (max_wait_s) latency cost.
    """

    def __init__(self, sampler: Sampler, slots: int = 4,
                 samples_per_req: int = MAX_NUM_SAMPLES,
                 max_wait_s: float = 0.01):
        import queue as _queue

        self.sampler = sampler
        self.slots = slots
        self.k = samples_per_req
        self.max_wait = max_wait_s
        self.emb_dim = int(sampler.cfg.text_embedding_dim)
        self.dispatches = 0  # observability: jitted calls issued
        self.requests = 0
        self._q: "_queue.Queue" = _queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, text_emb: np.ndarray, psi: float, seed: int):
        """Returns (event, box); box['images']/box['routing'] or
        box['error'] is set when event fires.

        The embedding shape is validated HERE (a wrong-sized embedding
        used to be silently truncated/zero-padded at dispatch time)."""
        emb = np.asarray(text_emb, np.float32).reshape(-1)
        if emb.shape[0] != self.emb_dim:
            raise ValueError(
                f"text embedding must have {self.emb_dim} dims, got {emb.shape[0]}"
            )
        ev = threading.Event()
        box: dict = {}
        self._q.put((emb, float(psi), int(seed), ev, box))
        return ev, box

    def prewarm(self):
        """Compile BOTH dispatch shapes (S=1 lone-request fast path and
        S=slots coalesced path) before accepting traffic, so neither the
        first lone request nor the first full batch pays a mid-serving
        XLA compile."""
        latent = int(self.sampler.cfg.latent_dim)
        for S in sorted({1, self.slots}):
            z = np.zeros((S * self.k, latent), np.float32)
            text = np.zeros((S * self.k, self.emb_dim), np.float32)
            psi = np.full((S * self.k,), 1.0, np.float32)
            self.sampler.sample_raw(z, text, psi)

    def _loop(self):
        import queue as _queue

        while True:
            batch = [self._q.get()]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.slots:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except _queue.Empty:
                    break
            try:
                self._run(batch)
            except Exception as e:  # pragma: no cover - defensive
                for *_, ev, box in batch:
                    box["error"] = str(e)
                    ev.set()

    def _run(self, batch):
        import jax

        R = len(batch)
        k = self.k
        latent = self.sampler.cfg.latent_dim
        # A lone request (idle queue) dispatches at its own shape instead
        # of paying the full slots*k padding — one extra compiled program,
        # 4x less compute for the common single-user case.
        S = self.slots if R > 1 else 1

        embs = np.zeros((S, self.emb_dim), np.float32)
        psis = np.full((S,), 1.0, np.float32)
        zs = np.zeros((S, k, latent), np.float32)
        for i, (emb, psi, seed, _, _) in enumerate(batch):
            embs[i] = emb  # shape validated in submit()
            psis[i] = psi
            zs[i] = np.asarray(
                jax.random.normal(jax.random.PRNGKey(seed), (k, latent))
            )
        # Padding slots reuse slot 0 (cheap, discarded).
        for i in range(R, S):
            embs[i] = embs[0]
            zs[i] = zs[0]

        text = np.repeat(embs, k, axis=0)              # [S*k, emb]
        psi_vec = np.repeat(psis, k, axis=0)           # [S*k]
        z = zs.reshape(S * k, latent)

        images, routing = self.sampler.sample_raw(z, text, psi_vec)
        images = np.asarray(images)
        self.dispatches += 1
        self.requests += R

        for i, (_, _, _, ev, box) in enumerate(batch):
            box["images"] = images[i * k : (i + 1) * k]
            box["routing"] = tuple(
                np.asarray(p[i * k : (i + 1) * k]) for p in routing
            )
            ev.set()


class InferenceHandler:
    """MMS-style handler (ref CustomInferenceHandler + handle, :362-421)."""

    def __init__(self, sampler: Sampler, fid: Optional[FIDEvaluator] = None,
                 batcher: Optional[MicroBatcher] = None):
        self.sampler = sampler
        self.fid = fid
        self.batcher = batcher

    @classmethod
    def from_model_dir(
        cls, model_dir: str, cfg: Optional[GeneratorConfig] = None, clip_params=None,
        batching: bool = True,
    ) -> "InferenceHandler":
        from moegan_tpu.utils.checkpoint import load_generator_params

        path = find_model_file(model_dir)
        if path is None:
            raise FileNotFoundError(f"no model artifact under {model_dir}")
        g_params = load_generator_params(path)
        if cfg is None:
            # Architecture must match the checkpoint, not the flagship
            # default: prefer a generator_config.json saved next to the
            # model (demo_train/train CLIs write one), else recover it
            # from the param shapes (reference load_model hard-codes its
            # one architecture, inference.py:34-105; ours is a ladder).
            cfg_path = os.path.join(model_dir, "generator_config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    cfg = GeneratorConfig.from_dict(json.load(f))
            else:
                from moegan_tpu.utils.checkpoint import infer_generator_config

                cfg = infer_generator_config(g_params)
        if clip_params is None:
            from moegan_tpu.models.clip_jax import load_clip_params

            clip_params = load_clip_params()
        sampler = Sampler(cfg, g_params, clip_params)
        # Default extractor = InceptionV3 pool-2048 (reference parity).
        fid = FIDEvaluator(reference_stats_path="reference_stats.npz")
        batcher = MicroBatcher(sampler) if batching else None
        return cls(sampler, fid, batcher)

    def transform_fn(self, request: dict) -> dict:
        """{text, num_samples, truncation_psi, calculate_fid} ->
        {images, prompt, fid_score?} (ref :252-357)."""
        text = request.get("text", "")
        if not text:
            raise ValueError("request must include 'text'")
        num_samples = min(int(request.get("num_samples", 1)), MAX_NUM_SAMPLES)
        psi = float(request.get("truncation_psi", 0.7))
        raw_seed = request.get("seed")
        seed = int(raw_seed) if raw_seed is not None else next_default_seed()

        if self.batcher is not None:
            # Dynamic batching: coalesce concurrent requests into one
            # fixed-shape TPU dispatch (see MicroBatcher).
            if isinstance(text, str) or (
                isinstance(text, list) and text and isinstance(text[0], str)
            ):
                emb = np.asarray(self.sampler.encode_text(text), np.float32)[0]
            else:
                emb = np.asarray(text, np.float32).reshape(-1)
            ev, box = self.batcher.submit(emb, psi, seed)
            if not ev.wait(timeout=120.0):
                raise TimeoutError("generation timed out in the batcher")
            if "error" in box:
                raise RuntimeError(box["error"])
            images = np.asarray(box["images"])[:num_samples]
            stats = expert_utilization_stats(box["routing"])
        else:
            # Always run the generator at MAX_NUM_SAMPLES and slice: one
            # compiled shape serves every request (no per-num_samples jit).
            images, stats = self.sampler(
                text, MAX_NUM_SAMPLES, psi, seed=seed, return_stats=True
            )
            images = np.asarray(images)[:num_samples]
        resp = {
            "images": images_to_b64_pngs(images),
            "prompt": text,
            "expert_utilization": stats,
        }
        if request.get("calculate_fid") and self.fid is not None:
            resp["fid_score"] = self.fid(images)
        return resp

    def handle(self, data, context=None):
        """MMS entry: list of {'body': bytes} -> list of JSON strings."""
        if data is None:
            return None
        out = []
        for item in data:
            body = item.get("body") if isinstance(item, dict) else item
            if isinstance(body, (bytes, bytearray)):
                body = body.decode("utf-8")
            req = json.loads(body) if isinstance(body, str) else body
            try:
                out.append(json.dumps(self.transform_fn(req)))
            except Exception as e:  # ref returns error JSON, not a crash
                out.append(json.dumps({"error": str(e)}))
        return out


class JobStore:
    """In-memory DynamoDB analog: request_id -> {status, data, expiry}."""

    def __init__(self, ttl_seconds: float = 24 * 3600):
        self.ttl = ttl_seconds
        self._jobs: dict[str, dict] = {}
        self._lock = threading.Lock()

    def put(self, request_id: str, status: str, data=None):
        with self._lock:
            self._jobs[request_id] = {
                "request_id": request_id,
                "status": status,
                "data": data,
                "expiration_time": time.time() + self.ttl,
            }

    def get(self, request_id: str) -> Optional[dict]:
        with self._lock:
            job = self._jobs.get(request_id)
            if job and job["expiration_time"] < time.time():
                del self._jobs[request_id]
                return None
            return job

    def sweep(self):
        now = time.time()
        with self._lock:
            for k in [k for k, v in self._jobs.items() if v["expiration_time"] < now]:
                del self._jobs[k]


def make_server(
    handler: InferenceHandler,
    *,
    metrics: Optional[dict] = None,
    host: str = "127.0.0.1",
    port: int = 8080,
) -> ThreadingHTTPServer:
    """HTTP server with the reference's public API shape.

    The job store is swept on every job submission AND by a background
    timer (DynamoDB-TTL analog, cloudformation.yaml:85-90), so abandoned
    request_ids can't grow the store unboundedly under a poll storm.
    """
    store = JobStore()
    model_metrics = metrics or {}
    stop_sweeper = threading.Event()

    def sweeper():
        while not stop_sweeper.wait(min(store.ttl / 4, 60.0)):
            store.sweep()

    def run_job(request_id: str, payload: dict):
        try:
            store.put(request_id, "PROCESSING")
            data = handler.transform_fn(payload)
            store.put(request_id, "COMPLETED", data)
        except Exception as e:
            store.put(request_id, "FAILED", {"error": str(e)})

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_OPTIONS(self):  # CORS preflight (ref :1279-1494)
            self.send_response(200)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Methods", "GET,POST,OPTIONS")
            self.send_header("Access-Control-Allow-Headers", "Content-Type")
            self.end_headers()

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._send(400, {"error": "invalid JSON body"})
            store.sweep()  # expire abandoned jobs on every submission
            if self.path == "/generate":
                if not payload.get("text"):
                    return self._send(400, {"error": "missing 'text'"})
                rid = str(uuid.uuid4())
                store.put(rid, "INITIALIZING")
                threading.Thread(target=run_job, args=(rid, payload), daemon=True).start()
                return self._send(202, {"request_id": rid})
            if self.path == "/image-metrics":
                if not payload.get("text"):
                    return self._send(400, {"error": "missing 'text'"})
                payload = {**payload, "calculate_fid": True,
                           "num_samples": min(int(payload.get("num_samples", 4)), MAX_NUM_SAMPLES)}
                rid = str(uuid.uuid4())
                store.put(rid, "INITIALIZING")
                threading.Thread(target=run_job, args=(rid, payload), daemon=True).start()
                return self._send(202, {"request_id": rid})
            return self._send(404, {"error": f"unknown path {self.path}"})

        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path == "/poll":
                rid = parse_qs(url.query).get("request_id", [None])[0]
                if not rid:
                    return self._send(400, {"error": "missing request_id"})
                job = store.get(rid)
                if job is None:
                    return self._send(404, {"status": "NOT_FOUND"})
                return self._send(200, {"status": job["status"], "data": job["data"]})
            if url.path == "/metrics":
                return self._send(200, model_metrics)
            if url.path == "/healthz":
                return self._send(200, {"status": "ok"})
            return self._send(404, {"error": f"unknown path {url.path}"})

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=sweeper, daemon=True).start()
    server.stop_sweeper = stop_sweeper  # set on shutdown to stop the timer
    _orig_shutdown = server.shutdown

    def shutdown():
        stop_sweeper.set()
        _orig_shutdown()

    server.shutdown = shutdown
    server.job_store = store  # exposed for tests / ops introspection
    return server


def serve(model_dir: str, host: str = "127.0.0.1", port: int = 8080, metrics=None):
    handler = InferenceHandler.from_model_dir(model_dir)
    if handler.batcher is not None:
        print("prewarming dispatch shapes (S=1, S=slots)...")
        handler.batcher.prewarm()
    server = make_server(handler, metrics=metrics, host=host, port=port)
    print(f"serving on http://{host}:{port}")
    server.serve_forever()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=os.environ.get("SM_MODEL_DIR", "./model"))
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    serve(args.model_dir, args.host, args.port)
