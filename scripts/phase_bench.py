#!/usr/bin/env python
"""Per-phase wall-clock breakdown of the 64x64 train step on the TPU.

Times G-forward, G-forward+backward, D-forward, D-forward+backward(+R1),
and each resolution's MoE + attention in isolation, using the same
scan-in-one-jit protocol as bench.py (per-dispatch timing through the
tunnel is unreliable). Identifies which phase moves away from the HBM
roofline as batch grows.

Usage: python scripts/phase_bench.py [--batch 64] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--resolution", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moegan_tpu.config import DiscriminatorConfig, GeneratorConfig
    from moegan_tpu.models.discriminator import AuroraDiscriminator
    from moegan_tpu.models.generator import AuroraGenerator

    r = args.resolution
    B = args.batch
    full = {4: 512, 8: 256, 16: 128, 32: 64, 64: 32}
    channels = {k: v for k, v in full.items() if k <= r}
    gcfg = GeneratorConfig(max_resolution=r, channels=channels, remat_blocks=False)
    dcfg = DiscriminatorConfig(max_resolution=r)
    gen = AuroraGenerator(gcfg)
    disc = AuroraDiscriminator(dcfg)

    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (B, gcfg.latent_dim), jnp.float32)
    text = jax.random.normal(jax.random.fold_in(key, 1), (B, 512), jnp.float32)
    imgs = jnp.tanh(jax.random.normal(jax.random.fold_in(key, 2), (B, r, r, 3)))

    g_vars = gen.init({"params": key, "router": key}, z, text)
    g_params = g_vars["params"]
    d_params = disc.init(key, imgs, text)["params"]

    def scan_timed(fn, *fn_args):
        """fn(*fn_args, i) -> scalar; scanned args.steps times inside jit."""

        def make(n):
            @jax.jit
            def multi(*a):
                def body(carry, i):
                    return carry + fn(*a, i), None

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return acc

            return multi

        mn, m1 = make(args.steps), make(1)
        _ = float(mn(*fn_args)); _ = float(m1(*fn_args))  # compile+warm
        t0 = time.perf_counter(); _ = float(mn(*fn_args)); tn = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = float(m1(*fn_args)); t1 = time.perf_counter() - t0
        return max((tn - t1) / (args.steps - 1), 1e-9)

    results = {}

    def g_fwd(params, i):
        out = gen.apply(
            {"params": params}, z, text, training=True,
            rngs={"router": jax.random.fold_in(key, i)},
        )
        return jnp.sum(out.image).astype(jnp.float32)

    results["g_forward_ms"] = scan_timed(g_fwd, g_params) * 1e3

    def g_fwdbwd(params, i):
        def loss(p):
            out = gen.apply(
                {"params": p}, z, text, training=True,
                rngs={"router": jax.random.fold_in(key, i)},
            )
            return jnp.sum(out.image).astype(jnp.float32)

        l, grads = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree_util.tree_leaves(grads))

    results["g_fwd_bwd_ms"] = scan_timed(g_fwdbwd, g_params) * 1e3

    # The D probes must depend on the scan index or XLA hoists the whole
    # body out of the loop (loop-invariant code motion) and the timing
    # reads ~0; perturb the images by i.
    def d_fwd(params, i):
        im = imgs + (i.astype(jnp.float32) * 1e-6)
        return jnp.sum(disc.apply({"params": params}, im, text)).astype(jnp.float32)

    results["d_forward_ms"] = scan_timed(d_fwd, d_params) * 1e3

    def d_fwdbwd_r1(params, i):
        im0 = imgs + (i.astype(jnp.float32) * 1e-6)

        def loss(p):
            logits = disc.apply({"params": p}, im0, text)
            grad_im = jax.grad(
                lambda im: jnp.sum(disc.apply({"params": p}, im, text))
            )(im0)
            return jnp.sum(logits).astype(jnp.float32) + jnp.sum(
                jnp.square(grad_im)
            ).astype(jnp.float32)

        l, grads = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree_util.tree_leaves(grads))

    results["d_fwd_bwd_r1_ms"] = scan_timed(d_fwdbwd_r1, d_params) * 1e3

    print(json.dumps({"batch": B, **{k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
