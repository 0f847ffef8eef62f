#!/usr/bin/env python
"""Per-rung attribution of the step-time-vs-roofline gap (VERDICT r3 #2).

Builds the FULL G+D train step at max_resolution 16 / 32 / 64 (reference
channel plan truncated per rung) and, for each variant, measures the
per-step wall-clock (scan-in-one-jit protocol, as bench.py) and derives
the HBM/compute rooflines from XLA cost analysis. The INCREMENTS between
consecutive variants attribute both the time and the roofline gap to
individual resolution rungs — the analysis README's "~15 ms waved at as
low-res scheduling" becomes a measured per-rung table:

    rung Δactual_ms  Δroofline_ms  Δgap_ms   gap share

Run on the real TPU (wall-clock matters); cost analysis is compile-only.

Usage: python scripts/rung_attribution.py [--batch 64] [--steps 16]
       [--config parity|tpu_flagship]
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
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--config", choices=["parity", "tpu_flagship"], default="parity")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--peak-hbm-gbs", type=float, default=819.0)
    ap.add_argument("--out", default="")
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

    if args.config == "tpu_flagship":
        full = {4: 512, 8: 512, 16: 256, 32: 128, 64: 64}
    else:
        full = {4: 512, 8: 256, 16: 128, 32: 64, 64: 32}

    def measure(r: int) -> dict:
        channels = {k: v for k, v in full.items() if k <= r}
        cfg = TrainConfig(
            generator=GeneratorConfig(max_resolution=r, channels=channels),
            discriminator=DiscriminatorConfig(
                max_resolution=r,
                base_channels=64 if args.config == "tpu_flagship" else 32,
            ),
            mesh=MeshConfig(expert_parallelism=0),
            steps_per_epoch=1000,
            batch_size=args.batch,
        )
        key = jax.random.PRNGKey(0)
        raw_step, _ = make_train_step(cfg, 1000, with_clip=False, jit_compile=False)
        state = create_train_state(cfg, key)
        batch = {
            "image": jnp.tanh(
                jax.random.normal(key, (args.batch, r, r, 3), jnp.float32)
            ),
            "text": jax.random.normal(jax.random.fold_in(key, 1), (args.batch, 512)),
        }
        schedule = {
            "temperature_factor": temperature_factor(0),
            "effective_kl_weight": jnp.float32(cfg.loss.kl_weight)
            * kl_annealing_factor(0, cfg.loss.kl_annealing_epochs),
        }

        def make_multi(n_steps):
            @jax.jit
            def multi(state, batch, rng, schedule):
                def body(carry, i):
                    st, m = raw_step(
                        carry, batch, jax.random.fold_in(rng, i), schedule, None
                    )
                    return st, m["d_loss"] + m["g_total"]

                st, losses = jax.lax.scan(body, state, jnp.arange(n_steps))
                return sum(
                    jnp.sum(x).astype(jnp.float32)
                    for x in (st.g_params["constant"], losses)
                )

            return multi

        def timed(fn, *a):
            _ = float(fn(*a))  # compile + warm
            t0 = time.perf_counter()
            _ = float(fn(*a))
            return time.perf_counter() - t0

        t_n = timed(make_multi(args.steps), state, batch, key, schedule)
        t_1 = timed(make_multi(1), state, batch, key, schedule)
        per_step_ms = max((t_n - t_1) / (args.steps - 1), 1e-9) * 1e3

        compiled = jax.jit(raw_step).lower(state, batch, key, schedule, None).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_accessed = float(ca.get("bytes accessed", 0.0))
        return {
            "max_resolution": r,
            "actual_ms": round(per_step_ms, 2),
            "gflops": round(flops / 1e9, 1),
            "hbm_gb": round(bytes_accessed / 1e9, 3),
            "roofline_ms_hbm": round(1e3 * bytes_accessed / (args.peak_hbm_gbs * 1e9), 2),
            "roofline_ms_compute": round(1e3 * flops / (args.peak_tflops * 1e12), 2),
        }

    rows = [measure(r) for r in (16, 32, 64)]
    for row in rows:
        row["roofline_ms"] = max(row["roofline_ms_hbm"], row["roofline_ms_compute"])
        row["gap_ms"] = round(row["actual_ms"] - row["roofline_ms"], 2)

    incr = []
    prev = None
    for row in rows:
        if prev is None:
            d = {"rung": f"<= {row['max_resolution']}"}
            d.update(
                d_actual_ms=row["actual_ms"],
                d_roofline_ms=row["roofline_ms"],
                d_gap_ms=row["gap_ms"],
            )
        else:
            d = {"rung": str(row["max_resolution"])}
            d.update(
                d_actual_ms=round(row["actual_ms"] - prev["actual_ms"], 2),
                d_roofline_ms=round(row["roofline_ms"] - prev["roofline_ms"], 2),
                d_gap_ms=round(row["gap_ms"] - prev["gap_ms"], 2),
            )
        incr.append(d)
        prev = row

    total_gap = rows[-1]["gap_ms"]
    for d in incr:
        d["gap_share_pct"] = round(100 * d["d_gap_ms"] / total_gap, 1) if total_gap else 0.0

    result = {
        "batch": args.batch,
        "config": args.config,
        "variants": rows,
        "incremental": incr,
        "total_gap_ms": total_gap,
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
