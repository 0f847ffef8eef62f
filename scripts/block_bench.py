#!/usr/bin/env python
"""Component-level fwd / fwd+bwd timings at flagship shapes.

Times SparseMoE, AttentionBlock, and ConvolutionBlock in isolation at
each resolution's [B, T, C] to locate where the generator backward's
time goes (phase_bench puts G bwd at ~2.6x G fwd). Scan-in-one-jit
protocol as in bench.py.

Usage: python scripts/block_bench.py [--batch 64] [--res 64 32 16]
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
    ap.add_argument("--res", type=int, nargs="*", default=[64, 32, 16])
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moegan_tpu.core.attention import AttentionBlock
    from moegan_tpu.core.moe import SparseMoE

    CH = {4: 512, 8: 256, 16: 128, 32: 64, 64: 32}
    B = args.batch
    key = jax.random.PRNGKey(0)

    def scan_timed(fn, *fn_args):
        def make(n):
            @jax.jit
            def multi(*a):
                def body(c, i):
                    return c + fn(*a, i), None

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return acc

            return multi

        mn, m1 = make(args.steps), make(1)
        _ = float(mn(*fn_args)); _ = float(m1(*fn_args))
        t0 = time.perf_counter(); _ = float(mn(*fn_args)); tn = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = float(m1(*fn_args)); t1 = time.perf_counter() - t0
        return max((tn - t1) / (args.steps - 1), 1e-9) * 1e3  # ms

    out = {}
    for r in args.res:
        C = CH[r]
        T = r * r
        x = jax.random.normal(key, (B, T, C), jnp.float32) * 0.1
        w = jax.random.normal(jax.random.fold_in(key, 1), (B, 512), jnp.float32)

        moe = SparseMoE(dim=C, text_dim=512, num_experts=4, router_hidden=128,
                        use_pallas=True)
        mvars = moe.init({"params": key, "router": key}, x, w)

        def moe_fwd(v, i):
            o, kl, p = moe.apply(v, x, w, training=True,
                                 rngs={"router": jax.random.fold_in(key, i)})
            return jnp.sum(o).astype(jnp.float32) + kl + jnp.sum(p)

        def moe_fwdbwd(v, i):
            def loss(vv):
                o, kl, p = moe.apply(vv, x, w, training=True,
                                     rngs={"router": jax.random.fold_in(key, i)})
                return jnp.sum(o * o).astype(jnp.float32) + kl + jnp.sum(p * p)

            l, g = jax.value_and_grad(loss)(v)
            return l + sum(jnp.sum(t).astype(jnp.float32)
                           for t in jax.tree_util.tree_leaves(g))

        heads = 8
        while heads > 1 and C // heads < 32:
            heads //= 2
        attn = AttentionBlock(dim=C, heads=heads, use_pallas=True)
        text_seq = w[:, None, :]
        avars = attn.init({"params": key, "router": key},
                          x.reshape(B, r, r, C), w, text_seq)

        def attn_fwd(v, i):
            o, kl, p = attn.apply(v, x.reshape(B, r, r, C), w, text_seq,
                                  training=True,
                                  rngs={"router": jax.random.fold_in(key, i)})
            return jnp.sum(o).astype(jnp.float32) + kl

        def attn_fwdbwd(v, i):
            def loss(vv):
                o, kl, p = attn.apply(vv, x.reshape(B, r, r, C), w, text_seq,
                                      training=True,
                                      rngs={"router": jax.random.fold_in(key, i)})
                return jnp.sum(o * o).astype(jnp.float32) + kl

            l, g = jax.value_and_grad(loss)(v)
            return l + sum(jnp.sum(t).astype(jnp.float32)
                           for t in jax.tree_util.tree_leaves(g))

        out[f"res{r}"] = {
            "moe_fwd_ms": round(scan_timed(moe_fwd, mvars), 2),
            "moe_fwdbwd_ms": round(scan_timed(moe_fwdbwd, mvars), 2),
            "attn_fwd_ms": round(scan_timed(attn_fwd, avars), 2),
            "attn_fwdbwd_ms": round(scan_timed(attn_fwdbwd, avars), 2),
        }
        print(json.dumps({f"res{r}": out[f"res{r}"]}))

    print(json.dumps({"batch": B, **out}))


if __name__ == "__main__":
    main()
