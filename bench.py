"""Benchmark: imgs/sec/chip for the 64x64 adversarial train step / generation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement protocol: the whole timed loop runs INSIDE one jit
(lax.scan over train steps / generation calls) and timing brackets a
single dispatch plus a hard host read of a scalar that depends on every
iteration. Per-dispatch timing through the axon tunnel is unreliable
(async completion signals fire early and per-call latency is tens of ms),
so naive loops overstate or understate throughput by large factors; the
scan protocol measures pure on-device execution with one tunnel roundtrip,
amortized over `--steps` iterations. Dispatch overhead is estimated by a
1-step run and subtracted.

The PyTorch reference publishes no throughput numbers (BASELINE.md), so
vs_baseline compares against this repo's own recorded first-round baseline
(bench_baseline.json, created on first run per config key).

Flags:
  --resolution 64   image resolution (16 reproduces the reference regime)
  --batch 32        per-chip batch size
  --steps 16        timed steps inside the scan
  --with-clip       include the multi-level CLIP perceptual loss
  --mode train|gen  train-step or pure-generation throughput
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions per measurement; the MEDIAN is "
                    "reported. Added in round 5 after interleaved A/B chains "
                    "showed single-sample spread up to +-40 imgs/s (e.g. a "
                    "1073 outlier vs a 1028-1035 replicated band, "
                    "runs/r5_tpu_log7-8.txt); 3 medianed reps cost ~2s and "
                    "cut that spread")
    ap.add_argument("--with-clip", action="store_true")
    ap.add_argument("--mode", choices=["train", "gen"], default="train")
    ap.add_argument("--remat", action="store_true",
                    help="enable generative-block rematerialization (off by "
                    "default: at 64x64 on v5e the recompute costs more than "
                    "the HBM it saves — see README perf table)")
    ap.add_argument("--no-remat", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--shared-fake", action="store_true",
                    help="one G forward per step (speed mode; default is the "
                         "reference-exact fresh fake per phase — see "
                         "runs/shared_fake_ab/ab_summary.json)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="disable Pallas kernels (XLA einsum MoE + chunked attention)")
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument("--config", choices=["parity", "tpu_flagship"], default="parity",
                    help="'parity' = reference-exact channel plan (headline); "
                    "'tpu_flagship' = every rung >= 64 channels, the TPU-first "
                    "plan that lifts the reference plan's 25% MXU-fill ceiling "
                    "(see moegan_tpu.config.tpu_flagship_config). Not "
                    "comparable to parity numbers: ~4x top-rung FLOPs.")
    args = ap.parse_args()
    # remat is opt-in since round 2 (--no-remat kept for back-compat).
    args.no_remat = not args.remat

    # Distinguish a dead TPU tunnel from a code failure BEFORE importing
    # jax (axon backend init hangs forever on a dead tunnel). A tunnel
    # outage prints a JSON marker line and exits rc=3 so BENCH_r*.json
    # records "backend unreachable", not "bench.py broken".
    if not args.cpu and "axon" in os.environ.get("JAX_PLATFORMS", ""):
        import urllib.error
        import urllib.request

        # Reachability = ANY HTTP response (the tunnel's /health returns
        # 404 when alive); only connection-level errors/timeouts, after
        # retries, mean the tunnel is down.
        last_err = None
        for _ in range(3):
            try:
                urllib.request.urlopen("http://127.0.0.1:8093/health", timeout=30)
                last_err = None
                break
            except urllib.error.HTTPError:
                last_err = None  # got an HTTP status -> tunnel is up
                break
            except Exception as e:
                last_err = e
                time.sleep(10)
        if last_err is not None:
            print(
                json.dumps(
                    {
                        "metric": "imgs/sec/chip (64x64 G+D train step)",
                        "value": 0,
                        "unit": "imgs/sec/chip",
                        "vs_baseline": 0,
                        "error": f"tpu_backend_unreachable: {last_err}",
                    }
                )
            )
            raise SystemExit(3)

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from moegan_tpu.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        MeshConfig,
        TrainConfig,
    )
    from moegan_tpu.losses.gan import kl_annealing_factor, temperature_factor
    from moegan_tpu.models.generator import AuroraGenerator
    from moegan_tpu.train.state import create_train_state
    from moegan_tpu.train.step import make_train_step

    r = args.resolution
    if args.config == "tpu_flagship":
        from moegan_tpu.config import tpu_flagship_config

        base = tpu_flagship_config()
        full = dict(base.generator.channels)
        disc = base.discriminator.replace(max_resolution=r)
    else:
        full = {4: 512, 8: 256, 16: 128, 32: 64, 64: 32}
        disc = DiscriminatorConfig(max_resolution=r)
    channels = {k: v for k, v in full.items() if k <= r}
    cfg = TrainConfig(
        generator=GeneratorConfig(
            max_resolution=r, channels=channels, remat_blocks=not args.no_remat,
            use_pallas=not args.no_pallas,
        ),
        discriminator=disc,
        mesh=MeshConfig(expert_parallelism=0),
        steps_per_epoch=1000,
        batch_size=args.batch,
        shared_fake=args.shared_fake,
    )
    key = jax.random.PRNGKey(0)
    n_chips = len(jax.devices())

    clip_params = None
    if args.with_clip:
        from moegan_tpu.models.clip_jax import load_clip_params

        clip_params = load_clip_params()

    batch = {
        "image": jnp.tanh(jax.random.normal(key, (args.batch, r, r, 3), jnp.float32)),
        "text": jax.random.normal(jax.random.fold_in(key, 1), (args.batch, 512)),
    }
    schedule = {
        "temperature_factor": temperature_factor(0),
        "effective_kl_weight": jnp.float32(cfg.loss.kl_weight)
        * kl_annealing_factor(0, cfg.loss.kl_annealing_epochs),
    }

    def timed(fn, *fn_args):
        """Run fn once (compile), then time dispatch + hard host read;
        median over --reps samples."""
        out = fn(*fn_args)
        _ = float(out)  # warm: full execution + transfer
        samples = []
        for _i in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            _ = float(fn(*fn_args))
            samples.append(time.perf_counter() - t0)
        return sorted(samples)[len(samples) // 2]

    if args.mode == "train":
        raw_step, _ = make_train_step(
            cfg, 1000, with_clip=args.with_clip, jit_compile=False
        )
        state = create_train_state(cfg, key)

        def make_multi(n_steps):
            @jax.jit
            def multi(state, batch, rng, schedule, clip_params):
                def body(carry, i):
                    st = carry
                    st, m = raw_step(st, batch, jax.random.fold_in(rng, i), schedule, clip_params)
                    # g_total keeps the (stop-gradient) CLIP branch alive —
                    # probing d_loss alone lets XLA DCE the CLIP forwards.
                    return st, m["d_loss"] + m["g_total"]

                st, losses = jax.lax.scan(body, state, jnp.arange(n_steps))
                # fold the final params into the scalar so nothing is dead
                probe = sum(
                    jnp.sum(x).astype(jnp.float32)
                    for x in (st.g_params["constant"], losses)
                )
                return probe

            return multi

        t_n = timed(make_multi(args.steps), state, batch, key, schedule, clip_params)
        t_1 = timed(make_multi(1), state, batch, key, schedule, clip_params)
        per_step = max((t_n - t_1) / (args.steps - 1), 1e-9)
        metric_name = f"imgs/sec/chip ({r}x{r} G+D train step)"
        if args.config != "parity":
            metric_name += f" [{args.config}]"
    else:
        gen = AuroraGenerator(cfg.generator)
        z = jax.random.normal(key, (args.batch, cfg.generator.latent_dim))
        params = gen.init({"params": key, "router": key}, z, batch["text"])["params"]

        def make_multi(n_steps):
            @jax.jit
            def multi(params, rng, text):
                def body(carry, i):
                    zi = jax.random.normal(
                        jax.random.fold_in(rng, i), (args.batch, cfg.generator.latent_dim)
                    )
                    img = gen.apply(
                        {"params": params}, zi, text, truncation_psi=0.7, training=False
                    ).image
                    return carry + jnp.sum(img).astype(jnp.float32), None

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_steps))
                return acc

            return multi

        t_n = timed(make_multi(args.steps), params, key, batch["text"])
        t_1 = timed(make_multi(1), params, key, batch["text"])
        per_step = max((t_n - t_1) / (args.steps - 1), 1e-9)
        metric_name = f"imgs/sec/chip ({r}x{r} generation)"

    imgs_per_sec_per_chip = args.batch / per_step / n_chips

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    baseline_key = f"{args.mode}_{r}_{args.batch}_clip{int(args.with_clip)}"
    if args.config != "parity":
        baseline_key += f"_{args.config}"
    if args.no_remat:
        baseline_key += "_noremat"
    if args.no_pallas:
        baseline_key += "_nopallas"
    baselines = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baselines = json.load(f)
    if baseline_key not in baselines:
        baselines[baseline_key] = imgs_per_sec_per_chip
        with open(baseline_path, "w") as f:
            json.dump(baselines, f, indent=2)
    # The flagship family (64x64 train step, no CLIP) always compares
    # against the ROUND-1 driver number (558 imgs/s/chip, BENCH_r01.json)
    # so vs_baseline tracks cross-round progress even as the default
    # batch/remat config evolves; other configs compare per-key.
    flagship = (
        args.mode == "train" and r == 64 and not args.with_clip
        and args.config == "parity"
    )
    if flagship and "flagship_round1" in baselines:
        vs_baseline = imgs_per_sec_per_chip / baselines["flagship_round1"]
    else:
        vs_baseline = imgs_per_sec_per_chip / baselines[baseline_key]

    print(
        json.dumps(
            {
                "metric": metric_name,
                "value": round(imgs_per_sec_per_chip, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
