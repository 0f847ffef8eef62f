"""Inference layer: sampling API, FID math, serving handler + HTTP API."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tests.helpers import TINY_GEN, tiny_generator_params


@pytest.fixture(scope="module")
def sampler():
    from moegan_tpu.infer.sample import Sampler

    return Sampler(TINY_GEN, tiny_generator_params())


def test_sample_from_embedding(sampler):
    emb = np.random.default_rng(0).normal(size=(512,)).astype(np.float32)
    imgs = sampler(emb, num_samples=3, truncation_psi=0.7, seed=1)
    assert imgs.shape == (3, 16, 16, 3)
    a = np.asarray(imgs)
    assert a.min() >= -1.0 and a.max() <= 1.0


def test_sample_expert_stats(sampler):
    emb = np.random.default_rng(0).normal(size=(512,)).astype(np.float32)
    imgs, stats = sampler(emb, num_samples=2, return_stats=True)
    assert set(stats) == {"block_0", "block_1", "block_2"}
    frac = stats["block_2"]["top1_fraction"]
    assert len(frac) == 4 and abs(sum(frac) - 1.0) < 1e-6


def test_micro_batcher_coalesces_and_matches_unbatched(sampler):
    """Concurrent submits coalesce into fewer TPU dispatches, and a
    batched request's images equal a direct sample_raw of the same
    (z, text, psi) slice — the traced per-sample psi path is exact."""
    import jax

    from moegan_tpu.infer.serving import MAX_NUM_SAMPLES, MicroBatcher

    rng = np.random.default_rng(3)
    embs = [rng.normal(size=(512,)).astype(np.float32) for _ in range(4)]
    psis = [0.5, 0.7, 0.9, 1.0]
    seeds = [11, 22, 33, 44]

    b = MicroBatcher(sampler, slots=4, max_wait_s=0.25)
    pending = []
    threads = []

    def go(i):
        pending.append((i, b.submit(embs[i], psis[i], seeds[i])))

    for i in range(4):
        t = threading.Thread(target=go, args=(i,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    for i, (ev, box) in pending:
        assert ev.wait(60.0), f"request {i} never completed"
        assert "error" not in box, box.get("error")
        assert box["images"].shape == (MAX_NUM_SAMPLES, 16, 16, 3)
    assert b.requests == 4
    assert b.dispatches < 4  # coalescing actually happened

    # Exactness: rebuild request 1's slice directly.
    k = MAX_NUM_SAMPLES
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(seeds[1]), (k, TINY_GEN.latent_dim)))
    text = np.repeat(embs[1][None], k, axis=0)
    imgs, _ = sampler.sample_raw(z, text, np.full((k,), psis[1], np.float32))
    got = dict(pending)[1][1]["images"]
    np.testing.assert_allclose(np.asarray(imgs), got, rtol=2e-4, atol=2e-4)


def test_default_seeds_are_unique():
    """Concurrent same-prompt requests must not share a default seed (the
    reference's time-based seed collides within one second)."""
    import concurrent.futures

    from moegan_tpu.infer.serving import next_default_seed

    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        seeds = list(ex.map(lambda _: next_default_seed(), range(2000)))
    assert len(set(seeds)) == len(seeds)
    assert all(0 <= s < 2**31 for s in seeds)


def test_batcher_rejects_bad_embedding_shape(sampler):
    from moegan_tpu.infer.serving import MicroBatcher

    b = MicroBatcher(sampler, slots=2, max_wait_s=0.01)
    with pytest.raises(ValueError, match="512"):
        b.submit(np.zeros(100, np.float32), 0.7, 1)
    # and through the handler: error JSON, not a crash
    from moegan_tpu.infer.serving import InferenceHandler

    h = InferenceHandler(sampler, batcher=b)
    out = h.handle([{"body": json.dumps({"text": [0.0] * 100})}])
    assert "error" in json.loads(out[0])


def test_lone_request_dispatches_small_shape(sampler):
    """A single request with an idle queue must not pay the full
    slots*k padded dispatch."""
    from moegan_tpu.infer.serving import MAX_NUM_SAMPLES, MicroBatcher

    shapes = []
    real = sampler.sample_raw

    class Spy:
        cfg = sampler.cfg

        @staticmethod
        def sample_raw(z, text, psi):
            shapes.append(z.shape[0])
            return real(z, text, psi)

    b = MicroBatcher(Spy(), slots=4, max_wait_s=0.01)
    emb = np.random.default_rng(0).normal(size=(512,)).astype(np.float32)
    ev, box = b.submit(emb, 0.7, 123)
    assert ev.wait(60.0) and "error" not in box
    assert box["images"].shape == (MAX_NUM_SAMPLES, 16, 16, 3)
    assert shapes == [MAX_NUM_SAMPLES]  # 1*k, not slots*k


def test_handler_batched_transform(sampler):
    from moegan_tpu.infer.serving import InferenceHandler, MicroBatcher

    h = InferenceHandler(sampler, batcher=MicroBatcher(sampler, slots=2, max_wait_s=0.01))
    emb = np.random.default_rng(5).normal(size=(512,)).astype(np.float32)
    resp = h.transform_fn({"text": emb.tolist(), "num_samples": 2, "seed": 7})
    assert len(resp["images"]) == 2
    assert set(resp["expert_utilization"]) == {"block_0", "block_1", "block_2"}


def test_fid_math():
    from moegan_tpu.infer.fid import frechet_distance, gaussian_stats

    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 8))
    mu, sig = gaussian_stats(a)
    # identical distributions -> ~0
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)
    # known shift: FID(N(0,I), N(m,I)) = ||m||^2
    d = frechet_distance(np.zeros(8), np.eye(8), np.ones(8) * 2.0, np.eye(8))
    assert d == pytest.approx(8 * 4.0, rel=1e-6)


def test_fid_reference_fallback(tmp_path):
    from moegan_tpu.infer.fid import FIDEvaluator

    ev = FIDEvaluator(extractor=lambda imgs: imgs.reshape(len(imgs), -1)[:, :8], feature_dim=8)
    ev.load_reference_stats(str(tmp_path / "missing.npz"))  # -> mu=0, sigma=I
    np.testing.assert_array_equal(ev.ref_mu, np.zeros(8))
    np.testing.assert_array_equal(ev.ref_sigma, np.eye(8))
    imgs = np.random.default_rng(0).normal(size=(32, 4, 4, 3)).astype(np.float32)
    assert np.isfinite(ev(imgs))


def test_inference_handler_schema(sampler):
    from moegan_tpu.infer.serving import InferenceHandler

    h = InferenceHandler(sampler)
    # string body through the MMS-style handle()
    body = json.dumps({"text": "a red bird", "num_samples": 2, "seed": 0})
    out = h.handle([{"body": body.encode()}])
    resp = json.loads(out[0])
    assert resp["prompt"] == "a red bird"
    assert len(resp["images"]) == 2
    assert "expert_utilization" in resp
    # base64 PNG magic
    import base64

    png = base64.b64decode(resp["images"][0])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # num_samples capped at 4 (ref :283)
    resp = json.loads(h.handle([{"body": json.dumps({"text": "x", "num_samples": 9})}])[0])
    assert len(resp["images"]) == 4
    # error path returns JSON, not a crash
    resp = json.loads(h.handle([{"body": json.dumps({"num_samples": 1})}])[0])
    assert "error" in resp


@pytest.fixture(scope="module")
def server(sampler):
    from moegan_tpu.infer.serving import InferenceHandler, make_server

    srv = make_server(InferenceHandler(sampler), metrics={"val_clip_loss": 0.81}, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_http_generate_poll_flow(server):
    import time

    status, resp = _post(server + "/generate", {"text": "a dog", "seed": 1})
    assert status == 202 and "request_id" in resp
    rid = resp["request_id"]
    for _ in range(120):
        status, poll = _get(server + f"/poll?request_id={rid}")
        if poll["status"] in ("COMPLETED", "FAILED"):
            break
        time.sleep(0.25)
    assert poll["status"] == "COMPLETED"
    assert poll["data"]["prompt"] == "a dog"
    assert len(poll["data"]["images"]) >= 1


def test_http_metrics_and_errors(server):
    status, m = _get(server + "/metrics")
    assert status == 200 and m["val_clip_loss"] == 0.81
    status, h = _get(server + "/healthz")
    assert h["status"] == "ok"
    # missing text -> 400
    try:
        _post(server + "/generate", {})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # unknown request id -> 404
    try:
        _get(server + "/poll?request_id=nope")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_checkpoint_roundtrip_msgpack(tmp_path, sampler):
    from moegan_tpu.utils.checkpoint import load_generator_params, save_generator_params

    p = str(tmp_path / "aurora_model_final.msgpack")
    save_generator_params(p, sampler.g_params)
    loaded = load_generator_params(p)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(sampler.g_params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_bare_params_tolerated(tmp_path, sampler):
    from moegan_tpu.utils.checkpoint import load_generator_params, save_generator_params

    p = str(tmp_path / "bare.npz")
    save_generator_params(p, sampler.g_params, wrapped=False)
    loaded = load_generator_params(p)
    assert "constant" in loaded


def test_job_store_bounded_under_poll_storm():
    """Expired jobs must vanish without a direct get — the store is swept
    on every job submission and by a background timer (round-1 gap:
    sweep() existed but was never scheduled)."""
    import time

    from moegan_tpu.infer.serving import JobStore

    store = JobStore(ttl_seconds=0.05)
    for i in range(50):
        store.put(f"job-{i}", "COMPLETED", {"n": i})
    assert len(store._jobs) == 50
    time.sleep(0.1)
    store.sweep()
    assert len(store._jobs) == 0


def test_infer_generator_config_from_params(sampler):
    """A bare checkpoint must reconstruct its own architecture: serving
    pointed at a non-flagship model dir used to build the flagship graph
    and die with ScopeParamNotFoundError (runs/r4_tpu_log4.txt item c)."""
    from moegan_tpu.utils.checkpoint import infer_generator_config

    cfg = infer_generator_config(sampler.g_params)
    assert cfg.max_resolution == TINY_GEN.max_resolution
    assert cfg.channels == dict(TINY_GEN.channels)
    assert cfg.router_hidden == TINY_GEN.router_hidden
    assert cfg.num_experts == TINY_GEN.num_experts
    assert cfg.rgb_min_resolution == TINY_GEN.rgb_min_resolution
    assert cfg.offset_max_resolution >= 16  # offsets present at <=16


def test_from_model_dir_recovers_architecture(tmp_path, sampler):
    """from_model_dir with no generator_config.json infers the ladder
    from param shapes and the handler samples end-to-end; with a saved
    generator_config.json it uses that instead."""
    from moegan_tpu.infer.serving import InferenceHandler
    from moegan_tpu.utils.checkpoint import save_generator_params

    d = tmp_path / "model"
    d.mkdir()
    save_generator_params(str(d / "aurora_model_final.msgpack"), sampler.g_params)
    h = InferenceHandler.from_model_dir(str(d), batching=False)
    assert h.sampler.cfg.max_resolution == 16
    out = h.transform_fn({"text": "x", "num_samples": 1})
    assert len(out["images"]) == 1

    with open(d / "generator_config.json", "w") as f:
        f.write(TINY_GEN.to_json())
    h2 = InferenceHandler.from_model_dir(str(d), batching=False)
    assert h2.sampler.cfg == TINY_GEN
