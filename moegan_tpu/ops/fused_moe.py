"""Fused Bayesian-MoE dispatch kernel (Pallas, TPU).

The north-star op: router projection -> temperature softmax (-> hard top-1
at eval) -> all-expert FFN -> probability-weighted combine, executed as
ONE on-device kernel. The XLA einsum formulation (core/moe.py) materializes
the [E, T, 4C] expert activations in HBM; this kernel keeps them in VMEM,
streaming token tiles against each expert's weights.

Grid: (T/block_t, E) with E innermost. Each program:
  - recomputes the routing probabilities for its token tile (cheap: the
    router is [C,h]x[h,E] with h=128, E=4),
  - runs its expert's FFN on the tile,
  - accumulates prob-weighted output into the shared out tile.

The Bayesian weight sampling (reparameterized epsilon draws) happens just
outside the kernel — it's a few tiny elementwise ops on [C,128]/[256,E]
matrices that XLA fuses into the kernel's input stream; the heavy math
(projection, softmax, dispatch, expert matmuls, combine) is all in-kernel.

Backward: custom_vjp recomputes through the identical XLA formulation
(`moe_ffn_reference`), so gradients are exact while the forward pass gets
the fused-kernel memory/bandwidth win.

probs parity contract with core/moe.py: clamp(logits/temp, +-20) ->
softmax -> floor 1e-6 -> renorm -> optional one-hot(argmax); verified by
tests/test_fused_moe.py against the reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs error 1.5e-7) — Mosaic lowers
    neither erf nor erfc, and 1.5e-7 is far below bf16 resolution."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _exact_gelu(x):
    """erf-GELU: 0.5*x*(1 + erf(x/sqrt(2))) (torch nn.GELU default)."""
    xf = x.astype(jnp.float32)
    return 0.5 * xf * (1.0 + _erf_poly(xf * 0.7071067811865476))


def _gelu_grad(z):
    """d/dz of the erf-GELU: Phi(z) + z * phi(z)."""
    zf = z.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_poly(zf * 0.7071067811865476))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * zf * zf)
    return cdf + zf * pdf


def _routing_probs(feat_logits, hard: bool):
    """Shared logits->probs tail (parity with BayesianRouter.__call__)."""
    logits = jnp.clip(feat_logits, -20.0, 20.0)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.clip(probs, 1e-6, 1.0)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    if hard:
        mx = jnp.max(probs, axis=-1, keepdims=True)
        onehot = (probs == mx).astype(probs.dtype)
        probs = onehot / jnp.sum(onehot, axis=-1, keepdims=True)
    return probs


def moe_ffn_reference(x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2, hard):
    """XLA reference formulation (identical math; backward + fallback)."""
    xf = x.astype(jnp.float32)
    feat_proj = xf @ fw.astype(jnp.float32)  # [T, h]
    logits = (feat_proj @ cw_f.astype(jnp.float32) + text_logits) * inv_temp
    probs = _routing_probs(logits, hard)

    cd = x.dtype
    h = jnp.einsum("tc,ecf->etf", x, w1.astype(cd), preferred_element_type=jnp.float32)
    h = h + b1[:, None, :].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(cd)
    y = jnp.einsum("etf,efc->etc", h, w2.astype(cd), preferred_element_type=jnp.float32)
    y = y + b2[:, None, :].astype(jnp.float32)
    out = jnp.einsum("te,etc->tc", probs, y)
    return out.astype(x.dtype), probs.astype(jnp.float32)


def _fused_moe_kernel(
    x_ref, fw_ref, cw_ref, tl_ref, it_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    out_ref, probs_ref, *, num_experts: int, hard: bool,
):
    """One (token-tile, expert) program."""
    e = pl.program_id(1)

    x = x_ref[:]  # [blk_t, C]
    xf = x.astype(jnp.float32)

    # Routing probabilities for this tile (recomputed per expert pass —
    # [blk_t, h] x [h, E] is noise next to the FFN matmuls).
    feat_proj = jax.lax.dot_general(
        xf, fw_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = jax.lax.dot_general(
        feat_proj, cw_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = (logits + tl_ref[:]) * it_ref[0]
    probs = _routing_probs(logits, hard)  # [blk_t, E]

    @pl.when(e == 0)
    def _():
        probs_ref[:] = probs
        out_ref[:] = jnp.zeros_like(out_ref)

    # This expert's FFN on the tile.
    cd = x.dtype
    h = jax.lax.dot_general(
        x, w1_ref[0].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[0].astype(jnp.float32)
    h = _exact_gelu(h).astype(cd)
    y = jax.lax.dot_general(
        h, w2_ref[0].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + b2_ref[0].astype(jnp.float32)

    # probs[:, e] via an iota mask — dynamic_slice on the lane axis does
    # not lower in Mosaic.
    lane = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 1)
    p_e = jnp.sum(jnp.where(lane == e, probs, 0.0), axis=-1, keepdims=True)
    out_ref[:] += (p_e * y).astype(out_ref.dtype)


def _fused_moe_pallas(x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2,
                      hard: bool, block_t: int):
    T, C = x.shape
    E = w1.shape[0]
    F = w1.shape[-1]
    hdim = fw.shape[-1]

    it = jnp.full((1,), inv_temp, jnp.float32)
    # Biases carry a singleton row so their blocks match TPU tiling rules
    # (block trailing dims must divide (8, 128) or equal the array's).
    b1r = b1[:, None, :]
    b2r = b2[:, None, :]

    grid = (T // block_t, E)
    out, probs = pl.pallas_call(
        functools.partial(_fused_moe_kernel, num_experts=E, hard=hard),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hdim), lambda t, e: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, E), lambda t, e: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), x.dtype),
            jax.ShapeDtypeStruct((T, E), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * T * C * F * E,
            bytes_accessed=2 * (T * C + E * 2 * C * F),
            transcendentals=T * E + T * F * E,
        ),
    )(x, fw, cw_f, text_logits, it, w1, b1r, w2, b2r)
    return out, probs


# ---------------------------------------------------------------------------
# fused backward kernels
# ---------------------------------------------------------------------------
#
# The XLA-recompute backward materializes the [E, T, 4C] expert activations
# (fp32) several times; at 64x64 that is ~2 GB of HBM traffic per step.
# These kernels recompute z/h per (tile, expert) in VMEM:
#   K_dx : dx_ffn (+ dp from the combine), grid (T_tiles, E), dx resident
#   K_dw2: dW2/db2, grid (E, T_tiles), dW2 resident across token tiles
#   K_dw1: dW1/db1, grid (E, T_tiles), dW1 resident across token tiles
# The router chain (probs pipeline -> dx_router, dfw, dcw, dtl, dinv_temp)
# is a handful of [T,E]/[T,h] matmuls — it stays in XLA.


def _probs_and_expert_tile(x, fw_ref, cw_ref, tl_ref, it_ref, w1_e, b1_e):
    """Shared recompute: (probs [blk,E], z fp32 [blk,F], h bf16 [blk,F])."""
    xf = x.astype(jnp.float32)
    feat_proj = jax.lax.dot_general(
        xf, fw_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = jax.lax.dot_general(
        feat_proj, cw_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = (logits + tl_ref[:]) * it_ref[0]
    probs = _routing_probs(logits, hard=False)

    z = jax.lax.dot_general(
        x, w1_e.astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_e.astype(jnp.float32)
    h = _exact_gelu(z).astype(x.dtype)
    return probs, z, h


def _p_e(probs, e):
    lane = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 1)
    return jnp.sum(jnp.where(lane == e, probs, 0.0), axis=-1, keepdims=True)


def _bwd_dx_kernel(
    x_ref, fw_ref, cw_ref, tl_ref, it_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    dout_ref, dx_ref, dp_ref,
):
    """dx_ffn and dp(combine) for one token tile; grid (T_tiles, E)."""
    e = pl.program_id(1)
    x = x_ref[:]
    dout = dout_ref[:].astype(jnp.float32)

    probs, z, h = _probs_and_expert_tile(
        x, fw_ref, cw_ref, tl_ref, it_ref, w1_ref[0], b1_ref[0]
    )

    y = jax.lax.dot_general(
        h, w2_ref[0].astype(h.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)

    @pl.when(e == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dp_ref[:] = jnp.zeros_like(dp_ref)

    # dp[t, e] = <dout_t, y_e_t>  (one column per expert pass)
    dp_col = jnp.sum(dout * y, axis=-1, keepdims=True)  # [blk, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, dp_ref.shape, 1)
    dp_ref[:] += jnp.where(lane == e, dp_col, 0.0)

    dy = _p_e(probs, e) * dout  # [blk, C]
    dh = jax.lax.dot_general(
        dy.astype(w2_ref.dtype), w2_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk, F]
    dz = dh * _gelu_grad(z)
    dx_ref[:] += jax.lax.dot_general(
        dz.astype(w1_ref.dtype), w1_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _bwd_dw2_kernel(
    x_ref, fw_ref, cw_ref, tl_ref, it_ref, w1_ref, b1_ref, dout_ref,
    dw2_ref, db2_ref,
):
    """dW2/db2 for one expert; grid (E, T_tiles), t innermost."""
    t = pl.program_id(1)
    x = x_ref[:]
    dout = dout_ref[:].astype(jnp.float32)

    probs, z, h = _probs_and_expert_tile(
        x, fw_ref, cw_ref, tl_ref, it_ref, w1_ref[0], b1_ref[0]
    )
    e = pl.program_id(0)
    dy = _p_e(probs, e) * dout  # [blk, C]

    @pl.when(t == 0)
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw2_ref[0] += jax.lax.dot_general(
        h, dy.astype(h.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw2_ref.dtype)
    db2_ref[0] += jnp.sum(dy, axis=0, keepdims=True).astype(db2_ref.dtype)


def _bwd_dw1_kernel(
    x_ref, fw_ref, cw_ref, tl_ref, it_ref, w1_ref, b1_ref, w2_ref, dout_ref,
    dw1_ref, db1_ref,
):
    """dW1/db1 for one expert; grid (E, T_tiles), t innermost."""
    t = pl.program_id(1)
    x = x_ref[:]
    dout = dout_ref[:].astype(jnp.float32)

    probs, z, h = _probs_and_expert_tile(
        x, fw_ref, cw_ref, tl_ref, it_ref, w1_ref[0], b1_ref[0]
    )
    e = pl.program_id(0)
    dy = _p_e(probs, e) * dout
    dh = jax.lax.dot_general(
        dy.astype(w2_ref.dtype), w2_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz = dh * _gelu_grad(z)

    @pl.when(t == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    dw1_ref[0] += jax.lax.dot_general(
        x, dz.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw1_ref.dtype)
    db1_ref[0] += jnp.sum(dz, axis=0, keepdims=True).astype(db1_ref.dtype)


def _bwd_fused_kernel(
    x_ref, fw_ref, cw_ref, tl_ref, it_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    dout_ref,
    dx_ref, dp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, num_experts: int,
):
    """Single-kernel FFN backward; grid (T_tiles, E), e innermost.

    One z/h recompute feeds dx, dW1/db1 AND dW2/db2 (the three-kernel
    version redid it per output — the reason it lost to XLA recompute in
    round 1). Residency: dx/dp blocks are indexed by t, so they stay in
    VMEM across the whole inner expert loop; the weight-grad outputs are
    whole-array blocks (constant index_map), resident for the entire
    grid — requires E*(C*F + F*C) fp32 accumulators to fit VMEM, i.e.
    C <= 128 on v5e, which covers the high-token-count blocks where the
    backward matters.
    """
    t = pl.program_id(0)
    e = pl.program_id(1)
    x = x_ref[:]
    dout = dout_ref[:].astype(jnp.float32)

    probs, z, h = _probs_and_expert_tile(
        x, fw_ref, cw_ref, tl_ref, it_ref, w1_ref[0], b1_ref[0]
    )

    # y_e for dp(combine): y = h @ w2 + b2 — b2 contributes a constant to
    # <dout, y_e>; include it for exactness.
    y = jax.lax.dot_general(
        h, w2_ref[0].astype(h.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)

    @pl.when(e == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dp_ref[:] = jnp.zeros_like(dp_ref)

    @pl.when(jnp.logical_and(t == 0, e == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dp_col = jnp.sum(dout * y, axis=-1, keepdims=True)  # [blk, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, dp_ref.shape, 1)
    dp_ref[:] += jnp.where(lane == e, dp_col, 0.0)

    dy = _p_e(probs, e) * dout  # [blk, C]
    dh = jax.lax.dot_general(
        dy.astype(w2_ref.dtype), w2_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk, F]
    dz = dh * _gelu_grad(z)

    dx_ref[:] += jax.lax.dot_general(
        dz.astype(w1_ref.dtype), w1_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)

    # Weight grads accumulate into this expert's row (dynamic index on the
    # leading axis lowers fine; it's the lane axis that doesn't).
    dzc = dz.astype(x.dtype)
    dw1_ref[e] += jax.lax.dot_general(
        x, dzc,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw1_ref.dtype)
    db1_ref[e] += jnp.sum(dz, axis=0, keepdims=True).astype(db1_ref.dtype)
    dw2_ref[e] += jax.lax.dot_general(
        h, dy.astype(h.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw2_ref.dtype)
    db2_ref[e] += jnp.sum(dy, axis=0, keepdims=True).astype(db2_ref.dtype)


def _fused_moe_bwd_single(res, dout, dprobs, block_t: int):
    """One-kernel FFN backward + XLA router chain."""
    x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2 = res
    T, C = x.shape
    E, _, F = w1.shape
    hdim = fw.shape[-1]
    it = jnp.full((1,), inv_temp, jnp.float32)
    b1r = b1[:, None, :]
    dout = dout.astype(x.dtype)

    outs = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, num_experts=E),
        grid=(T // block_t, E),
        in_specs=[
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hdim), lambda t, e: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, E), lambda t, e: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C, F), lambda t, e: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1, F), lambda t, e: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, F, C), lambda t, e: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1, C), lambda t, e: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), jnp.float32),
            jax.ShapeDtypeStruct((T, E), jnp.float32),
            jax.ShapeDtypeStruct((E, C, F), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, F), jnp.float32),
            jax.ShapeDtypeStruct((E, F, C), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * T * C * F * E,
            bytes_accessed=2 * (T * C + E * 2 * C * F) + 8 * E * 2 * C * F,
            transcendentals=2 * T * F * E,
        ),
        compiler_params=_bwd_compiler_params(),
    )(x, fw, cw_f, text_logits, it, w1, b1r, w2, b2[:, None, :], dout)
    dx_ffn, dp_combine, dw1, db1, dw2, db2 = outs

    dp_total = dprobs.astype(jnp.float32) + dp_combine
    # checkpoint: a plain vjp saves feat_proj ([T,h] fp32 — 134 MB at the
    # res-64 token count) as a residual; recomputing the two small router
    # matmuls in the backward is ~free.
    _, router_vjp = jax.vjp(
        jax.checkpoint(_router_probs_fn), x, fw, cw_f, text_logits, inv_temp
    )
    dx_r, dfw, dcw, dtl, dit = router_vjp(dp_total)

    dx = (dx_ffn + dx_r.astype(jnp.float32)).astype(x.dtype)
    return (
        dx,
        dfw.astype(fw.dtype),
        dcw.astype(cw_f.dtype),
        dtl.astype(text_logits.dtype),
        jnp.asarray(dit, jnp.float32).reshape(()),
        dw1.astype(w1.dtype),
        db1[:, 0, :].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[:, 0, :].astype(b2.dtype),
    )


# Weight-grad accumulators (E*(C*F + F*C) fp32) must fit VMEM alongside
# the working set; 4 MB keeps C<=128/F=512/E=4 in and C>=256 out on v5e
# (the C=256/F=1024 res-8 block would need ~8.4 MB of accumulators and
# falls back to the XLA-recompute backward). MOEGAN_MOE_BWD_VMEM_MB
# overrides the budget. Measured (round-4 chain,
# runs/r4_tpu_log1.txt item c): the C=256 v2 backward's TRUE scoped
# footprint is 18.79 MB (accumulators + stacked bf16 weight copies +
# the [blk, E*F] z/h/p_rep intermediates), i.e. past Mosaic's default
# 16 MB scoped-VMEM limit — so budgets > 16 MB are forwarded to Mosaic
# as vmem_limit_bytes (v5e VMEM is 128 MB; the 16 MB default is a
# scheduling heuristic, not a hardware bound). Default is 24 MB since
# the round-4 hardware A/B: with the C=256/F=1024 res-8 block on the
# single-kernel backward the b64 flagship ran 989.43 imgs/s/chip vs
# 984.29 on the XLA-recompute fallback (runs/r4_tpu_log3.txt item a vs
# r4_tpu_log2.txt item a).
_SINGLE_BWD_VMEM_BYTES = 24 * 1024 * 1024


_BWD_BUDGET_CACHE: dict = {}


def _bwd_vmem_budget() -> int:
    """VMEM budget for the single-kernel backward, with the env override.

    Parsed once per distinct env value (cached); a malformed value warns
    and falls back to the default instead of raising at trace time.
    """
    import os
    import warnings

    mb = os.environ.get("MOEGAN_MOE_BWD_VMEM_MB")
    if mb not in _BWD_BUDGET_CACHE:
        budget = _SINGLE_BWD_VMEM_BYTES
        if mb:
            try:
                budget = int(float(mb) * 1024 * 1024)
            except ValueError:
                warnings.warn(
                    f"MOEGAN_MOE_BWD_VMEM_MB={mb!r} is not a number; "
                    f"using the default {_SINGLE_BWD_VMEM_BYTES >> 20} MB"
                )
        _BWD_BUDGET_CACHE[mb] = budget
    return _BWD_BUDGET_CACHE[mb]


def _single_bwd_supported(C: int, F: int, E: int, T: int | None = None) -> bool:
    """Admit the single-kernel backward if its scoped-VMEM demand fits.

    accum <= 4 MB (the C<=128 regime) is the historical gate, proven on
    hardware at every batch size under Mosaic's default 16 MB limit.
    Past that the limit must be raised (24 MB default), and under a
    RAISED limit the compiler places the whole dx/dp result arrays in
    VMEM (observed: chain-5 b128 compile, runs/r4_tpu_log5.txt — dx
    f32[8192,256] and dp got S(1) memory space), so the demand grows
    with T. Calibrated model vs the two hardware measurements at
    C=256/F=1024/E=4: accum (2·E·C·F·4) + resident bf16 stacked weights
    (2·E·C·F·2) + whole dx/dp (T·(C+128)·4) + 2 MB block double-buffer
    margin → 20.9 MB at T=4096 (measured 18.79, fits 24) and 27.2 MB at
    T=8192 (measured 26.81, exceeds 24 → XLA-recompute fallback instead
    of a compile-time VMEM OOM)."""
    accum = 2 * E * C * F * 4
    if accum <= 4 * 1024 * 1024:
        return True
    budget = _bwd_vmem_budget()
    if T is None:
        return accum <= budget
    est = accum + 2 * E * C * F * 2 + T * (C + 128) * 4 + 2 * 1024 * 1024
    return est <= budget


def _bwd_compiler_params():
    """Mosaic params for the single-kernel backwards: a budget raised past
    the default 16 MB scoped-VMEM limit is forwarded as vmem_limit_bytes,
    otherwise the kernel could pass the gate yet fail Mosaic compilation
    (the round-4 C=256 trial: 18.79 MB true footprint vs the 16 MB limit)."""
    budget = _bwd_vmem_budget()
    if budget > 16 * 1024 * 1024:
        return pltpu.CompilerParams(vmem_limit_bytes=budget)
    return None


def _router_probs_fn(x, fw, cw_f, text_logits, inv_temp):
    """Router pipeline only (soft), for the small XLA backward."""
    xf = x.astype(jnp.float32)
    feat_proj = xf @ fw.astype(jnp.float32)
    logits = (feat_proj @ cw_f.astype(jnp.float32) + text_logits) * inv_temp
    return _routing_probs(logits, hard=False)


def _fused_moe_bwd_pallas(res, dout, dprobs, block_t: int):
    """Assembled backward: Pallas FFN kernels + XLA router chain."""
    x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2 = res
    T, C = x.shape
    E, _, F = w1.shape
    hdim = fw.shape[-1]
    it = jnp.full((1,), inv_temp, jnp.float32)
    b1r = b1[:, None, :]
    b2r = b2[:, None, :]
    dout = dout.astype(x.dtype)

    common_in = [
        pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, hdim), lambda t, e: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hdim, E), lambda t, e: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, E), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]

    dx_ffn, dp_combine = pl.pallas_call(
        _bwd_dx_kernel,
        grid=(T // block_t, E),
        in_specs=common_in + [
            pl.BlockSpec((1, C, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), jnp.float32),
            jax.ShapeDtypeStruct((T, E), jnp.float32),
        ],
    )(x, fw, cw_f, text_logits, it, w1, b1r, w2, b2r, dout)

    ew_in = [
        pl.BlockSpec((block_t, C), lambda e, t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, hdim), lambda e, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hdim, E), lambda e, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, E), lambda e, t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, C, F), lambda e, t: (e, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, F), lambda e, t: (e, 0, 0), memory_space=pltpu.VMEM),
    ]

    dw2, db2 = pl.pallas_call(
        _bwd_dw2_kernel,
        grid=(E, T // block_t),
        in_specs=ew_in + [
            pl.BlockSpec((block_t, C), lambda e, t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, F, C), lambda e, t: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda e, t: (e, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, F, C), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, C), jnp.float32),
        ],
    )(x, fw, cw_f, text_logits, it, w1, b1r, dout)

    dw1, db1 = pl.pallas_call(
        _bwd_dw1_kernel,
        grid=(E, T // block_t),
        in_specs=ew_in + [
            pl.BlockSpec((1, F, C), lambda e, t: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, C), lambda e, t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, F), lambda e, t: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda e, t: (e, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, C, F), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, F), jnp.float32),
        ],
    )(x, fw, cw_f, text_logits, it, w1, b1r, w2, dout)

    # Router chain in XLA: dp_total -> dx_router, dfw, dcw_f, dtl, dinv_temp.
    dp_total = dprobs.astype(jnp.float32) + dp_combine
    # checkpoint: a plain vjp saves feat_proj ([T,h] fp32 — 134 MB at the
    # res-64 token count) as a residual; recomputing the two small router
    # matmuls in the backward is ~free.
    _, router_vjp = jax.vjp(
        jax.checkpoint(_router_probs_fn), x, fw, cw_f, text_logits, inv_temp
    )
    dx_r, dfw, dcw, dtl, dit = router_vjp(dp_total)

    dx = (dx_ffn + dx_r.astype(jnp.float32)).astype(x.dtype)
    return (
        dx,
        dfw.astype(fw.dtype),
        dcw.astype(cw_f.dtype),
        dtl.astype(text_logits.dtype),
        jnp.asarray(dit, jnp.float32).reshape(()),
        dw1.astype(w1.dtype),
        db1[:, 0, :].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[:, 0, :].astype(b2.dtype),
    )


# ---------------------------------------------------------------------------
# v2 kernels: no expert grid — stacked-width matmuls
# ---------------------------------------------------------------------------
#
# Round-3 attribution (scripts/block_bench.py): the v1 (T_tiles, E) grid
# costs ~15.5 ms fwd+bwd at the res-64 token count — 4096 tiny programs
# whose [blk,32]x[32,128] matmuls are dwarfed by per-program overhead.
# v2 collapses the expert loop algebraically:
#
#   h_all = x @ [w1_1 .. w1_E]                  [blk, E*F]   (N fully filled)
#   sum_e p_e*(gelu(h_e) @ w2_e) + p_e*b2_e
#     = (p_rep * gelu(h_all)) @ [w2_1; ..; w2_E] + p @ b2    (K fully filled)
#
# with p_rep = p @ M, M[e, l] = 1{l // F == e} built from iotas (a tiny
# [blk,E]x[E,E*F] MXU matmul instead of lane gymnastics). One program per
# token tile, E x fewer programs, E x larger contractions. The backward
# keeps whole-array [C, E*F] weight-grad accumulators VMEM-resident
# (same _single_bwd_supported gate, C <= 128 — which covers every block
# where the MoE time lives). MOEGAN_MOE_KERNEL selects: "auto" (v2 where
# supported), "v1", "v2".


def _expert_mask(E: int, F: int, dtype=jnp.float32):
    """M [E, E*F]: M[e, l] = 1 if l // F == e."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (E, E * F), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (E, E * F), 1) // F
    return (rows == cols).astype(dtype)


def _fused_moe_kernel_v2(
    x_ref, fw_ref, cw_ref, tl_ref, it_ref, w1s_ref, b1s_ref, w2s_ref, b2s_ref,
    out_ref, probs_ref, *, num_experts: int, ffn_dim: int, hard: bool,
):
    """One token-tile program: router + ALL experts in stacked matmuls."""
    E, F = num_experts, ffn_dim
    x = x_ref[:]
    xf = x.astype(jnp.float32)

    feat_proj = jax.lax.dot_general(
        xf, fw_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = jax.lax.dot_general(
        feat_proj, cw_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = (logits + tl_ref[:]) * it_ref[0]
    probs = _routing_probs(logits, hard)  # [blk, E]
    probs_ref[:] = probs

    cd = x.dtype
    z = jax.lax.dot_general(
        x, w1s_ref[:].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1s_ref[0].astype(jnp.float32)  # [blk, E*F]
    h = _exact_gelu(z).astype(cd)

    M = _expert_mask(E, F)
    p_rep = jax.lax.dot_general(
        probs, M,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk, E*F]
    ph = (h.astype(jnp.float32) * p_rep).astype(cd)

    y = jax.lax.dot_general(
        ph, w2s_ref[:].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + jax.lax.dot_general(
        probs, b2s_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = y.astype(out_ref.dtype)


def _fused_moe_bwd_kernel_v2(
    x_ref, fw_ref, cw_ref, tl_ref, it_ref, w1s_ref, b1s_ref, w2s_ref, b2s_ref,
    dout_ref,
    dx_ref, dp_ref, dw1s_ref, db1s_ref, dw2s_ref, db2s_ref,
    *, num_experts: int, ffn_dim: int,
):
    """Single-kernel v2 backward; grid (T_tiles,). Weight-grad accumulators
    whole-array resident; dp here = combine cotangent (router chain in XLA
    outside, as in the v1 single-kernel backward)."""
    E, F = num_experts, ffn_dim
    t = pl.program_id(0)
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)

    feat_proj = jax.lax.dot_general(
        xf, fw_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = jax.lax.dot_general(
        feat_proj, cw_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = (logits + tl_ref[:]) * it_ref[0]
    probs = _routing_probs(logits, hard=False)

    cd = x.dtype
    z = jax.lax.dot_general(
        x, w1s_ref[:].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1s_ref[0].astype(jnp.float32)
    h = _exact_gelu(z).astype(cd)
    hf = h.astype(jnp.float32)

    M = _expert_mask(E, F)
    p_rep = jax.lax.dot_general(
        probs, M,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ph = (hf * p_rep).astype(cd)

    @pl.when(t == 0)
    def _():
        dw1s_ref[:] = jnp.zeros_like(dw1s_ref)
        db1s_ref[:] = jnp.zeros_like(db1s_ref)
        dw2s_ref[:] = jnp.zeros_like(dw2s_ref)
        db2s_ref[:] = jnp.zeros_like(db2s_ref)

    # combine backward
    d_ph = jax.lax.dot_general(
        dout.astype(cd), w2s_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk, E*F]
    dh = d_ph * p_rep
    dp_rep = d_ph * hf
    # dp[t, e] = sum_{l in block e} dp_rep[t, l]  (+ b2 term below)
    dp = jax.lax.dot_general(
        dp_rep, M,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk, E]
    dp = dp + jax.lax.dot_general(
        dout, b2s_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_ref[:] = dp

    dz = dh * _gelu_grad(z)
    dx_ref[:] = jax.lax.dot_general(
        dz.astype(cd), w1s_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)

    dzc = dz.astype(cd)
    dw1s_ref[:] += jax.lax.dot_general(
        x, dzc,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw1s_ref.dtype)
    db1s_ref[:] += jnp.sum(dz, axis=0, keepdims=True).astype(db1s_ref.dtype)
    dw2s_ref[:] += jax.lax.dot_general(
        ph, dout.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw2s_ref.dtype)
    db2s_ref[:] += jax.lax.dot_general(
        probs, dout,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(db2s_ref.dtype)


def _stack_weights(w1, b1, w2, b2):
    """[E,C,F]/[E,F]/[E,F,C]/[E,C] -> w1s [C,E*F], b1s [1,E*F],
    w2s [E*F,C], b2s [E,C] (block layouts matching h_all)."""
    E, C, F = w1.shape
    w1s = jnp.transpose(w1, (1, 0, 2)).reshape(C, E * F)
    b1s = b1.reshape(1, E * F)
    w2s = w2.reshape(E * F, C)
    return w1s, b1s, w2s, b2


def _fused_moe_pallas_v2(x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2,
                         hard: bool, block_t: int):
    T, C = x.shape
    E, _, F = w1.shape
    hdim = fw.shape[-1]
    it = jnp.full((1,), inv_temp, jnp.float32)
    w1s, b1s, w2s, b2s = _stack_weights(
        w1.astype(x.dtype), b1.astype(jnp.float32),
        w2.astype(x.dtype), b2.astype(jnp.float32),
    )

    out, probs = pl.pallas_call(
        functools.partial(
            _fused_moe_kernel_v2, num_experts=E, ffn_dim=F, hard=hard
        ),
        grid=(T // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hdim), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, E), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((C, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E * F, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), x.dtype),
            jax.ShapeDtypeStruct((T, E), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * T * C * F * E,
            bytes_accessed=2 * (T * C + E * 2 * C * F),
            transcendentals=T * F * E,
        ),
    )(x, fw, cw_f, text_logits, it, w1s, b1s, w2s, b2s)
    return out, probs


def _fused_moe_bwd_v2(res, dout, dprobs, block_t: int):
    """v2 single-kernel FFN backward + XLA router chain."""
    x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2 = res
    T, C = x.shape
    E, _, F = w1.shape
    hdim = fw.shape[-1]
    it = jnp.full((1,), inv_temp, jnp.float32)
    dout = dout.astype(x.dtype)
    w1s, b1s, w2s, b2s = _stack_weights(
        w1.astype(x.dtype), b1.astype(jnp.float32),
        w2.astype(x.dtype), b2.astype(jnp.float32),
    )

    outs = pl.pallas_call(
        functools.partial(_fused_moe_bwd_kernel_v2, num_experts=E, ffn_dim=F),
        grid=(T // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hdim), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, E), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((C, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E * F, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E * F, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), jnp.float32),
            jax.ShapeDtypeStruct((T, E), jnp.float32),
            jax.ShapeDtypeStruct((C, E * F), jnp.float32),
            jax.ShapeDtypeStruct((1, E * F), jnp.float32),
            jax.ShapeDtypeStruct((E * F, C), jnp.float32),
            jax.ShapeDtypeStruct((E, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * T * C * F * E,
            bytes_accessed=2 * (T * C + E * 2 * C * F) + 8 * E * 2 * C * F,
            transcendentals=2 * T * F * E,
        ),
        compiler_params=_bwd_compiler_params(),
    )(x, fw, cw_f, text_logits, it, w1s, b1s, w2s, b2s, dout)
    dx_ffn, dp_combine, dw1s, db1s, dw2s, db2s = outs

    dp_total = dprobs.astype(jnp.float32) + dp_combine
    _, router_vjp = jax.vjp(
        jax.checkpoint(_router_probs_fn), x, fw, cw_f, text_logits, inv_temp
    )
    dx_r, dfw, dcw, dtl, dit = router_vjp(dp_total)

    dx = (dx_ffn + dx_r.astype(jnp.float32)).astype(x.dtype)
    dw1 = jnp.transpose(dw1s.reshape(C, E, F), (1, 0, 2))
    return (
        dx,
        dfw.astype(fw.dtype),
        dcw.astype(cw_f.dtype),
        dtl.astype(text_logits.dtype),
        jnp.asarray(dit, jnp.float32).reshape(()),
        dw1.astype(w1.dtype),
        db1s.reshape(E, F).astype(b1.dtype),
        dw2s.reshape(E, F, C).astype(w2.dtype),
        db2s.astype(b2.dtype),
    )


def _v2_wanted(C: int, F: int, E: int, T: int | None = None) -> bool:
    import os

    mode = os.environ.get("MOEGAN_MOE_KERNEL", "auto")
    if mode == "v1":
        return False
    if mode == "v2":
        # Explicit override: force v2 even past the VMEM gate (the point
        # of the flag is on-hardware trials; a too-big accumulator set
        # fails at Mosaic compile time with a clear VMEM error).
        return True
    # auto: v2 only where the single-kernel backward's 2*C*(E*F) fp32
    # accumulators (+ bf16 weight copies, + whole dx/dp when the Mosaic
    # limit is raised — pass T from backward call sites) fit the budget.
    return _single_bwd_supported(C, F, E, T)


# ---------------------------------------------------------------------------
# probs-as-input FFN+combine kernels (the expert-sharded formulation)
# ---------------------------------------------------------------------------
#
# Under expert parallelism the router runs once in XLA (its [T,C]x[C,h] and
# [h,E] matmuls are noise), producing the full [T, E] probabilities; each
# chip's shard_map body then receives only its local expert columns of
# probs and its local shard of the stacked FFN weights, and runs this
# kernel: per-(tile, local-expert) FFN + prob-weighted partial combine.
# The cross-chip combine is a psum over the 'expert' mesh axis (see
# core/moe.py:_fused_sharded). Keeping the router outside the shard_map
# gives textbook AD semantics: dprobs assembles from per-shard column
# grads, replicated inputs psum their cotangents — no replicated-output
# transpose subtleties.


def moe_ffn_combine_reference(x, probs, w1, b1, w2, b2):
    """XLA formulation of sum_e probs[:, e] * FFN_e(x) (backward + fallback)."""
    cd = x.dtype
    h = jnp.einsum("tc,ecf->etf", x, w1.astype(cd), preferred_element_type=jnp.float32)
    h = h + b1[:, None, :].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(cd)
    y = jnp.einsum("etf,efc->etc", h, w2.astype(cd), preferred_element_type=jnp.float32)
    y = y + b2[:, None, :].astype(jnp.float32)
    out = jnp.einsum("te,etc->tc", probs.astype(jnp.float32), y)
    return out.astype(x.dtype)


def _combine_kernel(x_ref, p_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """One (token-tile, local-expert) program: out += p_e * FFN_e(x)."""
    e = pl.program_id(1)
    x = x_ref[:]

    @pl.when(e == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cd = x.dtype
    h = jax.lax.dot_general(
        x, w1_ref[0].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[0].astype(jnp.float32)
    h = _exact_gelu(h).astype(cd)
    y = jax.lax.dot_general(
        h, w2_ref[0].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + b2_ref[0].astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, p_ref.shape, 1)
    p_e = jnp.sum(jnp.where(lane == e, p_ref[:], 0.0), axis=-1, keepdims=True)
    out_ref[:] += (p_e * y).astype(out_ref.dtype)


def _combine_bwd_kernel(
    x_ref, p_ref, w1_ref, b1_ref, w2_ref, b2_ref, dout_ref,
    dx_ref, dp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
):
    """Single-kernel backward of the combine; grid (T_tiles, E), e innermost.

    Same residency story as _bwd_fused_kernel: dx/dp blocks stay in VMEM
    across the expert loop, weight-grad accumulators are whole-array
    resident for the full grid (gated by _single_bwd_supported)."""
    t = pl.program_id(0)
    e = pl.program_id(1)
    x = x_ref[:]
    dout = dout_ref[:].astype(jnp.float32)

    z = jax.lax.dot_general(
        x, w1_ref[0].astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h = _exact_gelu(z).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[0].astype(h.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)

    @pl.when(e == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dp_ref[:] = jnp.zeros_like(dp_ref)

    @pl.when(jnp.logical_and(t == 0, e == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dp_col = jnp.sum(dout * y, axis=-1, keepdims=True)  # [blk, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, dp_ref.shape, 1)
    dp_ref[:] += jnp.where(lane == e, dp_col, 0.0)

    p_e = jnp.sum(jnp.where(lane == e, p_ref[:].astype(jnp.float32), 0.0),
                  axis=-1, keepdims=True)
    dy = p_e * dout  # [blk, C]
    dh = jax.lax.dot_general(
        dy.astype(w2_ref.dtype), w2_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk, F]
    dz = dh * _gelu_grad(z)

    dx_ref[:] += jax.lax.dot_general(
        dz.astype(w1_ref.dtype), w1_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)

    dzc = dz.astype(x.dtype)
    dw1_ref[e] += jax.lax.dot_general(
        x, dzc,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw1_ref.dtype)
    db1_ref[e] += jnp.sum(dz, axis=0, keepdims=True).astype(db1_ref.dtype)
    dw2_ref[e] += jax.lax.dot_general(
        h, dy.astype(h.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw2_ref.dtype)
    db2_ref[e] += jnp.sum(dy, axis=0, keepdims=True).astype(db2_ref.dtype)


def _combine_fwd_pallas(x, probs, w1, b1, w2, b2, block_t: int):
    T, C = x.shape
    E, _, F = w1.shape
    out = pl.pallas_call(
        _combine_kernel,
        grid=(T // block_t, E),
        in_specs=[
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * C * F * E,
            bytes_accessed=2 * (T * C + E * 2 * C * F),
            transcendentals=T * F * E,
        ),
    )(x, probs, w1, b1[:, None, :], w2, b2[:, None, :])
    return out


def _combine_bwd_pallas(res, dout, block_t: int):
    x, probs, w1, b1, w2, b2 = res
    T, C = x.shape
    E, _, F = w1.shape
    dout = dout.astype(x.dtype)

    outs = pl.pallas_call(
        _combine_bwd_kernel,
        grid=(T // block_t, E),
        in_specs=[
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda t, e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, C), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t, e: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C, F), lambda t, e: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1, F), lambda t, e: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, F, C), lambda t, e: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1, C), lambda t, e: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), jnp.float32),
            jax.ShapeDtypeStruct((T, E), jnp.float32),
            jax.ShapeDtypeStruct((E, C, F), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, F), jnp.float32),
            jax.ShapeDtypeStruct((E, F, C), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * T * C * F * E,
            bytes_accessed=2 * (T * C + E * 2 * C * F) + 8 * E * 2 * C * F,
            transcendentals=2 * T * F * E,
        ),
    )(x, probs, w1, b1[:, None, :], w2, b2[:, None, :], dout)
    dx, dp, dw1, db1, dw2, db2 = outs
    return (
        dx.astype(x.dtype),
        dp.astype(probs.dtype),
        dw1.astype(w1.dtype),
        db1[:, 0, :].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[:, 0, :].astype(b2.dtype),
    )


def _combine_kernel_v2(
    x_ref, p_ref, w1s_ref, b1s_ref, w2s_ref, b2s_ref, out_ref,
    *, num_experts: int, ffn_dim: int,
):
    """v2 combine: one token-tile program, stacked-width matmuls."""
    E, F = num_experts, ffn_dim
    x = x_ref[:]
    probs = p_ref[:].astype(jnp.float32)
    cd = x.dtype

    z = jax.lax.dot_general(
        x, w1s_ref[:].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1s_ref[0].astype(jnp.float32)
    h = _exact_gelu(z).astype(cd)

    M = _expert_mask(E, F)
    p_rep = jax.lax.dot_general(
        probs, M,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ph = (h.astype(jnp.float32) * p_rep).astype(cd)
    y = jax.lax.dot_general(
        ph, w2s_ref[:].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + jax.lax.dot_general(
        probs, b2s_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = y.astype(out_ref.dtype)


def _combine_bwd_kernel_v2(
    x_ref, p_ref, w1s_ref, b1s_ref, w2s_ref, b2s_ref, dout_ref,
    dx_ref, dp_ref, dw1s_ref, db1s_ref, dw2s_ref, db2s_ref,
    *, num_experts: int, ffn_dim: int,
):
    E, F = num_experts, ffn_dim
    t = pl.program_id(0)
    x = x_ref[:]
    probs = p_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)
    cd = x.dtype

    z = jax.lax.dot_general(
        x, w1s_ref[:].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1s_ref[0].astype(jnp.float32)
    h = _exact_gelu(z).astype(cd)
    hf = h.astype(jnp.float32)

    M = _expert_mask(E, F)
    p_rep = jax.lax.dot_general(
        probs, M,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ph = (hf * p_rep).astype(cd)

    @pl.when(t == 0)
    def _():
        dw1s_ref[:] = jnp.zeros_like(dw1s_ref)
        db1s_ref[:] = jnp.zeros_like(db1s_ref)
        dw2s_ref[:] = jnp.zeros_like(dw2s_ref)
        db2s_ref[:] = jnp.zeros_like(db2s_ref)

    d_ph = jax.lax.dot_general(
        dout.astype(cd), w2s_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = d_ph * p_rep
    dp_rep = d_ph * hf
    dp = jax.lax.dot_general(
        dp_rep, M,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        dout, b2s_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_ref[:] = dp.astype(dp_ref.dtype)

    dz = dh * _gelu_grad(z)
    dx_ref[:] = jax.lax.dot_general(
        dz.astype(cd), w1s_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)

    dzc = dz.astype(cd)
    dw1s_ref[:] += jax.lax.dot_general(
        x, dzc,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw1s_ref.dtype)
    db1s_ref[:] += jnp.sum(dz, axis=0, keepdims=True).astype(db1s_ref.dtype)
    dw2s_ref[:] += jax.lax.dot_general(
        ph, dout.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw2s_ref.dtype)
    db2s_ref[:] += jax.lax.dot_general(
        probs, dout,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(db2s_ref.dtype)


def _combine_fwd_pallas_v2(x, probs, w1, b1, w2, b2, block_t: int):
    T, C = x.shape
    E, _, F = w1.shape
    w1s, b1s, w2s, b2s = _stack_weights(
        w1.astype(x.dtype), b1.astype(jnp.float32),
        w2.astype(x.dtype), b2.astype(jnp.float32),
    )
    return pl.pallas_call(
        functools.partial(_combine_kernel_v2, num_experts=E, ffn_dim=F),
        grid=(T // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E * F, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * C * F * E,
            bytes_accessed=2 * (T * C + E * 2 * C * F),
            transcendentals=T * F * E,
        ),
    )(x, probs, w1s, b1s, w2s, b2s)


def _combine_bwd_pallas_v2(res, dout, block_t: int):
    x, probs, w1, b1, w2, b2 = res
    T, C = x.shape
    E, _, F = w1.shape
    dout = dout.astype(x.dtype)
    w1s, b1s, w2s, b2s = _stack_weights(
        w1.astype(x.dtype), b1.astype(jnp.float32),
        w2.astype(x.dtype), b2.astype(jnp.float32),
    )
    outs = pl.pallas_call(
        functools.partial(_combine_bwd_kernel_v2, num_experts=E, ffn_dim=F),
        grid=(T // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E * F, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, E), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E * F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E * F, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), jnp.float32),
            jax.ShapeDtypeStruct((T, E), jnp.float32),
            jax.ShapeDtypeStruct((C, E * F), jnp.float32),
            jax.ShapeDtypeStruct((1, E * F), jnp.float32),
            jax.ShapeDtypeStruct((E * F, C), jnp.float32),
            jax.ShapeDtypeStruct((E, C), jnp.float32),
        ],
    )(x, probs, w1s, b1s, w2s, b2s, dout)
    dx, dp, dw1s, db1s, dw2s, db2s = outs
    dw1 = jnp.transpose(dw1s.reshape(C, E, F), (1, 0, 2))
    return (
        dx.astype(x.dtype),
        dp.astype(probs.dtype),
        dw1.astype(w1.dtype),
        db1s.reshape(E, F).astype(b1.dtype),
        dw2s.reshape(E, F, C).astype(w2.dtype),
        db2s.astype(b2.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def moe_ffn_combine(x, probs, w1, b1, w2, b2, block_t: int = 256):
    """sum_e probs[:, e] * FFN_e(x), fused on TPU.

    Args:
      x: [T, C] tokens (compute dtype). probs: [T, E] combine weights
      (fp32; may be a local expert-column shard under shard_map).
      w1/b1/w2/b2: stacked expert FFN weights [E, C, F]/[E, F]/[E, F, C]/
      [E, C] — E is the LOCAL expert count when sharded.

    Returns out [T, C] (the per-shard partial when E is a shard).
    """
    bt = min(block_t, x.shape[0])
    if not _pallas_supported(x, bt):
        return moe_ffn_combine_reference(x, probs, w1, b1, w2, b2)
    E, _, F = w1.shape
    C = x.shape[1]
    if _v2_wanted(C, F, E):
        return _combine_fwd_pallas_v2(x, probs, w1, b1, w2, b2, bt)
    return _combine_fwd_pallas(x, probs, w1, b1, w2, b2, bt)


def _combine_vjp_fwd(x, probs, w1, b1, w2, b2, block_t):
    out = moe_ffn_combine(x, probs, w1, b1, w2, b2, block_t)
    return out, (x, probs, w1, b1, w2, b2)


def _combine_vjp_bwd(block_t, res, dout):
    import os

    x, probs, w1, b1, w2, b2 = res
    bt = min(block_t, x.shape[0])
    E, C, F = w1.shape
    mode = os.environ.get("MOEGAN_PALLAS_MOE_BWD", "1")
    if (
        mode != "0"
        and _pallas_supported(x, bt)
        and _single_bwd_supported(C, F, E, x.shape[0])
    ):
        if _v2_wanted(C, F, E, x.shape[0]):
            return _combine_bwd_pallas_v2(res, dout, bt)
        return _combine_bwd_pallas(res, dout, bt)
    _, vjp = jax.vjp(moe_ffn_combine_reference, x, probs, w1, b1, w2, b2)
    return vjp(dout)


moe_ffn_combine.defvjp(_combine_vjp_fwd, _combine_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_moe_ffn(
    x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2,
    hard: bool = False, block_t: int = 256,
):
    """Fused router+dispatch+FFN.

    Args:
      x: [T, C] tokens. fw: [C, h] (sampled) feature projection.
      cw_f: [h, E] feature half of the combined projection.
      text_logits: [T, E] per-token text contribution (text_proj @ cw_t).
      inv_temp: scalar 1/effective_temperature.
      w1/b1/w2/b2: stacked expert FFN weights [E, C, 4C]/[E, 4C]/...
      hard: top-1 one-hot routing (eval path).

    Returns (out [T, C], probs [T, E]).
    """
    return _fused_impl(x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2, hard, block_t)


def _pallas_supported(x, block_t) -> bool:
    T, C = x.shape
    return (
        jax.default_backend() == "tpu"
        and T % block_t == 0
        and C % 8 == 0
    )


def _fused_impl(x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2, hard, block_t):
    block_t = min(block_t, x.shape[0])
    if not _pallas_supported(x, block_t):
        return moe_ffn_reference(x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2, hard)
    E, C, F = w1.shape
    if _v2_wanted(C, F, E):
        return _fused_moe_pallas_v2(
            x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2, hard, block_t
        )
    return _fused_moe_pallas(x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2, hard, block_t)


def _fused_fwd(x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2, hard, block_t):
    out = _fused_impl(x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2, hard, block_t)
    return out, (x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2)


def _fused_bwd(hard, block_t, res, g):
    x, fw, cw_f, text_logits, inv_temp, w1, b1, w2, b2 = res
    dout, dprobs = g
    bt = min(block_t, x.shape[0])
    # Round-1's THREE-kernel Pallas backward lost to XLA recompute (523 vs
    # 557 imgs/sec/chip: each kernel redid the z/h recompute). Round 2
    # collapses it to ONE kernel sharing the recompute across dx/dW1/dW2
    # (see _bwd_fused_kernel) — measured 727 vs 694 imgs/sec/chip on the
    # b64 64x64 step, so it is now the DEFAULT on the blocks whose
    # accumulators fit VMEM (C<=128). MOEGAN_PALLAS_MOE_BWD selects:
    #   "1" single-kernel + XLA-recompute fallback (default),
    #   "0" XLA recompute everywhere, "3" force the legacy 3-kernel.
    import os

    mode = os.environ.get("MOEGAN_PALLAS_MOE_BWD", "1")
    if not hard and _pallas_supported(x, bt) and mode in ("1", "3"):
        E, C, F = w1.shape
        if mode == "1":
            # v2 (no expert grid, stacked-width matmuls) where it fits
            # VMEM; v1 single-kernel as fallback preference; XLA recompute
            # elsewhere (the 3-kernel path measured slower than XLA on the
            # big-C blocks, and compiling it wastes minutes of Mosaic time).
            if _v2_wanted(C, F, E, x.shape[0]):
                return _fused_moe_bwd_v2(res, dout, dprobs, bt)
            if _single_bwd_supported(C, F, E, x.shape[0]):
                return _fused_moe_bwd_single(res, dout, dprobs, bt)
        else:
            return _fused_moe_bwd_pallas(res, dout, dprobs, bt)
    # Default: recompute through the identical XLA formulation.
    _, vjp = jax.vjp(
        lambda *a: moe_ffn_reference(*a, hard), x, fw, cw_f, text_logits,
        inv_temp, w1, b1, w2, b2,
    )
    return vjp(g)


fused_moe_ffn.defvjp(_fused_fwd, _fused_bwd)
