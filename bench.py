"""Benchmark: imgs/sec/chip for the full 64x64 adversarial train step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star metric (BASELINE.json) is imgs/sec/chip for the 64x64
train step + generation. The PyTorch reference publishes no throughput
numbers (BASELINE.md), so vs_baseline is measured against this repo's own
recorded first-round baseline (bench_baseline.json, created on first run) —
the ratio tracks round-over-round improvement on identical hardware.

Flags:
  --resolution 64     image resolution (16 reproduces the reference regime)
  --batch 32          per-chip batch size
  --steps 20          timed steps (after warmup)
  --with-clip         include the multi-level CLIP perceptual loss
  --mode train|gen    train step throughput or pure generation throughput
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--with-clip", action="store_true")
    ap.add_argument("--mode", choices=["train", "gen"], default="train")
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    args = ap.parse_args()

    import jax

    # Persistent compilation cache: first-compile through the TPU tunnel is
    # slow; later bench invocations reuse the compiled step.
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
        LossConfig,
        MeshConfig,
        TrainConfig,
    )
    from moegan_tpu.losses.gan import kl_annealing_factor, temperature_factor
    from moegan_tpu.models.generator import AuroraGenerator
    from moegan_tpu.parallel.api import setup_distributed_training

    r = args.resolution
    full = {4: 512, 8: 256, 16: 128, 32: 64, 64: 32}
    channels = {k: v for k, v in full.items() if k <= r}
    cfg = TrainConfig(
        generator=GeneratorConfig(max_resolution=r, channels=channels),
        discriminator=DiscriminatorConfig(max_resolution=r),
        mesh=MeshConfig(expert_parallelism=0),
        steps_per_epoch=1000,
        batch_size=args.batch,
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

    if args.mode == "train":
        mesh, state, step_fn = setup_distributed_training(
            cfg, key, steps_per_epoch=1000, with_clip=args.with_clip
        )
        rngs = [jax.random.fold_in(key, 100 + i) for i in range(args.steps + args.warmup)]
        for i in range(args.warmup):
            state, m = step_fn(state, batch, rngs[i], schedule, clip_params)
        jax.block_until_ready(m["d_loss"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = step_fn(state, batch, rngs[args.warmup + i], schedule, clip_params)
        jax.block_until_ready(m["d_loss"])
        dt = time.perf_counter() - t0
        metric_name = f"imgs/sec/chip ({r}x{r} G+D train step)"
    else:
        gen = AuroraGenerator(cfg.generator)
        z = jax.random.normal(key, (args.batch, cfg.generator.latent_dim))
        text = batch["text"]
        params = gen.init({"params": key, "router": key}, z, text)["params"]

        @jax.jit
        def gen_fn(params, z, text):
            return gen.apply(
                {"params": params}, z, text, truncation_psi=0.7, training=False
            ).image

        out = gen_fn(params, z, text)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.steps):
            out = gen_fn(params, z, text)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        metric_name = f"imgs/sec/chip ({r}x{r} generation)"

    imgs_per_sec_per_chip = args.batch * args.steps / dt / n_chips

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    baseline_key = f"{args.mode}_{r}_{args.batch}_clip{int(args.with_clip)}"
    baselines = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baselines = json.load(f)
    if baseline_key not in baselines:
        baselines[baseline_key] = imgs_per_sec_per_chip
        with open(baseline_path, "w") as f:
            json.dump(baselines, f, indent=2)
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
