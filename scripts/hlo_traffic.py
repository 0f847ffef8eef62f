#!/usr/bin/env python
"""Attribute HBM traffic of the compiled 64x64 train step.

Parses the optimized HLO of the jitted step and ranks ops by output
bytes (a proxy for HBM writes; inputs of fusions are counted once as
reads via operand shapes). Compile-only — safe to run while the chip is
busy. Helps decide WHERE to attack traffic (which resolution / which op
family) instead of guessing.

Usage: python scripts/hlo_traffic.py [--batch 64] [--top 25]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

SHAPE_RE = re.compile(r"(bf16|f32|f16|s32|u32|pred|s8|u8)\[([0-9,]*)\]")
BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def shape_bytes(m):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * BYTES[dt]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

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
    compiled = jax.jit(raw_step).lower(state, batch, key, schedule, None).compile()
    text = compiled.as_text()

    # Only the ENTRY computation's ops touch HBM; fusion bodies are
    # register/VMEM-resident and would massively overcount.
    entry_lines = []
    in_entry = False
    for line in text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            entry_lines.append(line.strip())

    per_op = []
    family = defaultdict(int)
    op_re = re.compile(r"\s([a-z][a-z0-9\-]*)\(")  # first op-style token(
    for line in entry_lines:
        m = re.match(r"(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*", line)
        if not m:
            continue
        name = m.group(1)
        rest = line[m.end():]
        # The output shape may be a tuple with nested parens from layout
        # annotations (T(8,128), S(1)); the op mnemonic is the first
        # lowercase word directly followed by '(' after the shape.
        om = op_re.search(rest)
        if not om:
            continue
        shape_s, op = rest[: om.start()], om.group(1)
        if op in ("parameter", "constant", "get-tuple-element", "tuple", "bitcast"):
            continue
        out_bytes = sum(shape_bytes(s) for s in SHAPE_RE.finditer(shape_s))
        if out_bytes == 0:
            continue
        per_op.append((out_bytes, op, name, line))
        family[op] += out_bytes

    per_op.sort(key=lambda t: -t[0])
    total = sum(t[0] for t in per_op)
    print(json.dumps({
        "batch": args.batch,
        "total_output_gb_all_ops": round(total / 1e9, 2),
        "by_family_gb": {
            k: round(v / 1e9, 2)
            for k, v in sorted(family.items(), key=lambda kv: -kv[1])[:12]
        },
    }))
    src_re = re.compile(
        r'op_name="([^"]*)"|source_file="([^"]*)"|source_line=(\d+)'
    )
    for b, op, name, line in per_op[: args.top]:
        op_name = src = sline = ""
        for m in src_re.finditer(line):
            op_name = m.group(1) or op_name
            src = m.group(2) or src
            sline = m.group(3) or sline
        loc = f"{src.rsplit('/', 1)[-1]}:{sline}" if src else ""
        print(f"{b/1e6:10.1f} MB  {op:20s} {line[:110]}")
        if op_name or loc:
            print(f"{'':14s} -> {op_name[:130]}  [{loc}]")


if __name__ == "__main__":
    main()
