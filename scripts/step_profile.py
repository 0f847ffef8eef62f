#!/usr/bin/env python
"""XLA cost analysis of the 64x64 G+D train step: FLOPs + HBM bytes per
step, plus derived MFU / HBM-utilization at a measured throughput.

Usage: python scripts/step_profile.py [--batch 64] [--remat] [--imgs-per-sec N]

Compile-only (cost_analysis needs the compiled executable, not a run), so
it is safe to run while something else owns the chip. Peaks default to
TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--with-clip", action="store_true")
    ap.add_argument("--imgs-per-sec", type=float, default=0.0,
                    help="measured throughput to derive MFU / HBM util from")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--peak-hbm-gbs", type=float, default=819.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moegan_tpu.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        MeshConfig,
        TrainConfig,
    )
    from moegan_tpu.losses.gan import kl_annealing_factor, temperature_factor
    from moegan_tpu.train.state import create_train_state
    from moegan_tpu.train.step import make_train_step

    r = args.resolution
    full = {4: 512, 8: 256, 16: 128, 32: 64, 64: 32}
    channels = {k: v for k, v in full.items() if k <= r}
    cfg = TrainConfig(
        generator=GeneratorConfig(
            max_resolution=r, channels=channels, remat_blocks=args.remat
        ),
        discriminator=DiscriminatorConfig(max_resolution=r),
        mesh=MeshConfig(expert_parallelism=0),
        steps_per_epoch=1000,
        batch_size=args.batch,
    )
    key = jax.random.PRNGKey(0)
    raw_step, _ = make_train_step(cfg, 1000, with_clip=args.with_clip,
                                  jit_compile=False)
    state = create_train_state(cfg, key)
    batch = {
        "image": jnp.zeros((args.batch, r, r, 3), jnp.float32),
        "text": jnp.zeros((args.batch, 512), jnp.float32),
    }
    schedule = {
        "temperature_factor": temperature_factor(0),
        "effective_kl_weight": jnp.float32(cfg.loss.kl_weight)
        * kl_annealing_factor(0, cfg.loss.kl_annealing_epochs),
    }
    clip_params = None
    if args.with_clip:
        from moegan_tpu.models.clip_jax import load_clip_params

        clip_params = load_clip_params()

    compiled = (
        jax.jit(raw_step)
        .lower(state, batch, key, schedule, clip_params)
        .compile()
    )
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    out = {
        "batch": args.batch,
        "resolution": r,
        "remat": args.remat,
        "with_clip": args.with_clip,
        "gflops_per_step": round(flops / 1e9, 1),
        "hbm_gb_per_step": round(bytes_accessed / 1e9, 2),
        "arithmetic_intensity_flops_per_byte": round(flops / max(bytes_accessed, 1), 2),
    }
    if args.imgs_per_sec > 0:
        steps_per_sec = args.imgs_per_sec / args.batch
        tflops_eff = flops * steps_per_sec / 1e12
        hbm_eff = bytes_accessed * steps_per_sec / 1e9
        out.update(
            effective_tflops=round(tflops_eff, 2),
            mfu_pct=round(100 * tflops_eff / args.peak_tflops, 2),
            effective_hbm_gbs=round(hbm_eff, 1),
            hbm_util_pct=round(100 * hbm_eff / args.peak_hbm_gbs, 1),
            roofline_ms_compute=round(1e3 * flops / (args.peak_tflops * 1e12), 2),
            roofline_ms_hbm=round(1e3 * bytes_accessed / (args.peak_hbm_gbs * 1e9), 2),
            actual_ms=round(1e3 / steps_per_sec, 2),
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
