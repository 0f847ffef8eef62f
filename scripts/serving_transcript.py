#!/usr/bin/env python
"""Record a real /generate -> /poll -> image serving transcript.

The reference's serving path is exercised only by deployment
(frontend/index.html:329 -> API Gateway -> Lambda -> SageMaker async ->
poll loop, SURVEY.md §3.4). This script drives the rebuilt control plane
(infer/serving.py) end-to-end over real HTTP on localhost and records the
whole exchange — request, every poll response, timing, and the decoded
image — as runs/serving/{transcript.json, image_0.png}.

Usage:
  python scripts/serving_transcript.py [--model-dir runs/demo] [--prompt ...]
The model dir needs an aurora_model_final.msgpack (demo_train.py output).
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import threading
import time
import urllib.request


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=os.path.join("runs", "demo"))
    ap.add_argument("--prompt", default="a city skyline at sunset")
    ap.add_argument("--num-samples", type=int, default=2)
    ap.add_argument("--port", type=int, default=8099)
    ap.add_argument("--out-dir", default=os.path.join("runs", "serving"))
    args = ap.parse_args()

    import jax

    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moegan_tpu.infer.serving import InferenceHandler, make_server

    os.makedirs(args.out_dir, exist_ok=True)
    handler = InferenceHandler.from_model_dir(args.model_dir)
    if handler.batcher is not None:
        handler.batcher.prewarm()
    server = make_server(handler, host="127.0.0.1", port=args.port)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{args.port}"

    transcript = {"base_url": base, "model_dir": args.model_dir, "exchanges": []}

    def call(method, path, body=None):
        t0 = time.time()
        req = urllib.request.Request(
            base + path,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"},
            method=method,
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                code, payload = r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            code, payload = e.code, json.loads(e.read())
        transcript["exchanges"].append(
            {
                "request": {"method": method, "path": path, "body": body},
                "response_code": code,
                "latency_ms": round((time.time() - t0) * 1000, 1),
                # images are summarized in the transcript (full b64 goes
                # to disk as png) to keep the artifact reviewable
                "response": _summarize(payload),
            }
        )
        return code, payload

    def _summarize(payload):
        out = json.loads(json.dumps(payload))  # deep copy
        data = out.get("data") or {}
        if isinstance(data, dict) and isinstance(data.get("images"), list):
            data["images"] = [
                f"<base64 png, {len(s)} chars>" for s in data["images"]
            ]
        return out

    code, health = call("GET", "/healthz")
    assert code == 200, health

    code, gen = call(
        "POST", "/generate",
        {"text": args.prompt, "num_samples": args.num_samples, "truncation_psi": 0.7},
    )
    assert code == 202 and "request_id" in gen, gen
    rid = gen["request_id"]

    # The frontend polls every 3s (frontend/index.html:416-429); mirror it.
    images = None
    for _ in range(60):
        code, poll = call("GET", f"/poll?request_id={rid}")
        if poll.get("status") == "COMPLETED":
            images = poll["data"]["images"]
            break
        if poll.get("status") == "FAILED":
            raise RuntimeError(f"job failed: {poll}")
        time.sleep(3)
    assert images, "generation never completed"

    for i, b64 in enumerate(images):
        with open(os.path.join(args.out_dir, f"image_{i}.png"), "wb") as f:
            f.write(base64.b64decode(b64))

    code, metrics = call("GET", "/metrics")

    server.shutdown()
    transcript["result"] = {
        "status": "COMPLETED",
        "num_images": len(images),
        "prompt": args.prompt,
    }
    with open(os.path.join(args.out_dir, "transcript.json"), "w") as f:
        json.dump(transcript, f, indent=2)
    print(f"transcript + {len(images)} image(s) in {args.out_dir}")


if __name__ == "__main__":
    main()
