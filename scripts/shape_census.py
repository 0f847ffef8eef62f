#!/usr/bin/env python
"""MXU shape census of the train step: the fill-corrected compute floor.

Walks the UNOPTIMIZED StableHLO of the jitted b64 train step (lowering
only — no backend compile, so it runs anywhere in seconds) and collects
every dot_general / convolution with its contraction (K) and output (N)
dimensions. The v5e MXU processes 128x128 tiles; an op with K or N below
128 can use at most (min(K,128)/128) * (min(N,128)/128) of peak — the
narrow channel plan (C=32 at res 64) caps most generator matmuls at
25% or less NO MATTER how they are scheduled. Summing flops/ceiling
over all ops gives the fill-corrected compute roofline — the honest
"speed of light" for this architecture on this hardware, to compare
against the plain peak-FLOPs roofline and the measured step time.

Pallas custom calls don't appear as dots in StableHLO; their shapes are
added analytically from the kernel definitions (flash attention QK/PV
per level, fused MoE stacked-width matmuls).

Usage: python scripts/shape_census.py [--batch 64] [--imgs-per-sec N]
Prints one JSON line plus a per-bucket table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_HBM_GBS = 819.0


def mxu_fill(k: int, n: int) -> float:
    return (min(k, 128) / 128.0) * (min(n, 128) / 128.0)


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--imgs-per-sec", type=float, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # lowering only

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
    cfg = TrainConfig(
        generator=GeneratorConfig(
            max_resolution=r,
            channels={k: v for k, v in full.items() if k <= r},
            remat_blocks=False,
        ),
        discriminator=DiscriminatorConfig(max_resolution=r),
        mesh=MeshConfig(expert_parallelism=0),
        steps_per_epoch=1000,
        batch_size=args.batch,
    )
    key = jax.random.PRNGKey(0)
    raw_step, _ = make_train_step(cfg, 1000, with_clip=False, jit_compile=False)
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
    text = jax.jit(raw_step).lower(state, batch, key, schedule, None).as_text()

    # ---- parse dot_general ------------------------------------------------
    # %x = stablehlo.dot_general %a, %b, batching_dims = [..] x [..],
    #      contracting_dims = [i] x [j] ... : (tensor<AxBxf32>, tensor<...>)
    dot_re = re.compile(
        r"stablehlo\.dot_general\s+%\S+,\s+%\S+,"
        r"(?:\s+batching_dims\s*=\s*\[([\d, ]*)\]\s*x\s*\[([\d, ]*)\]\s*,)?"
        r"\s+contracting_dims\s*=\s*\[([\d, ]*)\]\s*x\s*\[([\d, ]*)\]"
        r".*?:\s*\(tensor<([^>]+)>,\s*tensor<([^>]+)>\)",
        re.DOTALL,
    )
    conv_re = re.compile(
        r"stablehlo\.convolution.*?:\s*\(tensor<([^>]+)>,\s*tensor<([^>]+)>\)\s*->\s*tensor<([^>]+)>",
        re.DOTALL,
    )

    def dims(t: str):
        parts = t.split("x")
        return [int(p) for p in parts[:-1]]

    buckets = defaultdict(lambda: [0, 0.0, 0.0])  # count, gflops, ceil_ms

    def add(tag, flops, k, n):
        fill = max(mxu_fill(k, n), 1e-3)
        b = buckets[f"{tag} K={k} N={n} fill={fill:.0%}"]
        b[0] += 1
        b[1] += flops / 1e9
        b[2] += flops / (PEAK_TFLOPS * 1e12 * fill) * 1e3

    for m in dot_re.finditer(text):
        bl, br, cl, cr, lt, rt = m.groups()
        ld, rd = dims(lt), dims(rt)
        cls = [int(x) for x in cl.split(",") if x.strip()]
        crs = [int(x) for x in cr.split(",") if x.strip()]
        bls = [int(x) for x in (bl or "").split(",") if x.strip()]
        brs = [int(x) for x in (br or "").split(",") if x.strip()]
        k = 1
        for c in cls:
            k *= ld[c]
        bsz = 1
        for c in bls:
            bsz *= ld[c]
        m_sz = 1
        for i, d in enumerate(ld):
            if i not in cls and i not in bls:
                m_sz *= d
        n_sz = 1
        for i, d in enumerate(rd):
            if i not in crs and i not in brs:
                n_sz *= d
        flops = 2.0 * bsz * m_sz * n_sz * k
        add("dot", flops, k, n_sz)

    for m in conv_re.finditer(text):
        lt, rt, ot = m.groups()
        ld, rd, od = dims(lt), dims(rt), dims(ot)
        # NHWC x HWIO -> NHWC (the only form the model emits)
        if len(rd) == 4:
            kh, kw, ci, co = rd
            n_out = 1
            for d in od[:-1]:
                n_out *= d
            flops = 2.0 * n_out * co * kh * kw * ci
            add("conv", flops, kh * kw * ci, co)

    # ---- pallas kernels (analytic) ---------------------------------------
    B = args.batch
    for res, c in full.items():
        if res > r:
            continue
        t = res * res
        if t < 256:
            continue  # flash gate
        h = cfg.generator.heads_for(c)
        hd = c // h
        bh = B * h
        # fwd QK+PV; bwd QK recompute, dP, dQ, dK, dV  (G fwd x2 + bwd)
        fwd = 2 * (2.0 * bh * t * t * hd)
        bwd = 5 * (2.0 * bh * t * t * hd)
        add("flash", 2 * fwd + bwd, hd, t)  # K=hd dominates the floor
        # fused MoE: stacked-width [bT, C] @ [C, E*4C] and back (fwd),
        # bwd ~2x with the single-kernel recompute
        e = cfg.generator.num_experts
        bt = B * t
        moe_fwd = 2.0 * bt * c * (e * 4 * c) * 2  # two matmul layers
        add("moe", 2 * moe_fwd + 2 * moe_fwd, c, e * 4 * c)

    rows = sorted(buckets.items(), key=lambda kv: -kv[1][2])
    tot_gflops = sum(v[1] for v in buckets.values())
    tot_ceil_ms = sum(v[2] for v in buckets.values())
    naive_ms = tot_gflops / (PEAK_TFLOPS * 1e3) * 1e3
    out = {
        "batch": B,
        "resolution": r,
        "total_matmul_gflops": round(tot_gflops, 1),
        "naive_peak_roofline_ms": round(naive_ms, 2),
        "fill_corrected_compute_floor_ms": round(tot_ceil_ms, 2),
    }
    if args.imgs_per_sec:
        actual = B / args.imgs_per_sec * 1e3
        out["actual_ms"] = round(actual, 2)
        out["pct_of_fill_corrected_floor"] = round(100 * tot_ceil_ms / actual, 1)
    print(json.dumps(out))
    for name, (cnt, gf, ms) in rows[:20]:
        print(f"{ms:8.2f} ms  {gf:9.1f} GF  x{cnt:<4d} {name}")


if __name__ == "__main__":
    main()
