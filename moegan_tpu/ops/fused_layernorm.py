"""Fused LayerNorm (Pallas, TPU): bf16 in/out, fp32 statistics in VMEM.

The attention blocks LayerNorm their token stream three times per block
(t2i_moe_gan.py:505-507) in fp32 (torch autocast semantics). Under XLA
that materializes an fp32 copy of the [B, T, C] stream PLUS a
lane-transposed copy for the C-reduction — the round-3 HLO traffic
ranking showed five 67 MB f32 {1,2,0}-layout copy-starts per step from
exactly these converts at the 64x64 flagship. This kernel reads the
bf16 stream once, computes mean/variance per token in fp32 registers,
and writes the bf16 result once.

Math parity: y = (x - mu) * rsqrt(var + eps) * scale + bias with
biased variance and fp32 arithmetic — identical to
flax.linen.LayerNorm(dtype=f32) up to one bf16 rounding of the output
(the XLA path rounds once at the consumer's cast instead). eps is the
caller's (use 1e-5 for torch nn.LayerNorm parity).

The backward recomputes mu/inv from the saved input (two cheap VPU
reductions) rather than saving them: a per-row fp32 scalar stored to
HBM is physically padded to 128 lanes by TPU tiling — the same
511-bytes-of-padding-per-row trap the flash-attention lse hit.

  dxhat = dy * scale
  dx = inv * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))
  dscale = sum_rows(dy * xhat); dbias = sum_rows(dy)

dscale/dbias accumulate in whole-[1, C] fp32 VMEM blocks across the
sequential TPU grid (zeroed at program 0), the same pattern as the
fused-MoE weight-grad accumulators (ops/fused_moe.py).
"""

from __future__ import annotations

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)  # [block, C]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = xc * inv * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, s_ref, dy_ref, dx_ref, ds_ref, db_ref, *, eps: float):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)

    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv

    dxhat = dy * s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (inv * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    ds_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


def _supported(n: int, c: int, block: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    return n % block == 0 and c % 8 == 0 and c <= 512


def _pick_block(n: int) -> int:
    for b in (1024, 512, 256, 128, 8):
        if n % b == 0:
            return b
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps: float = 1e-5):
    """x: [..., C] (any leading dims); scale/bias: [C]. fp32 stats.

    Falls back to plain XLA ops off-TPU or for unsupported shapes.
    """
    return _fwd_impl(x, scale, bias, eps)


def _xla_ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    return y.astype(x.dtype)


def _fwd_impl(x, scale, bias, eps):
    c = x.shape[-1]
    n = 1
    for d in x.shape[:-1]:
        n *= d
    block = _pick_block(n)
    if not block or not _supported(n, c, block):
        return _xla_ln(x, scale, bias, eps)
    xf = x.reshape(n, c)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
    )(xf, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(x.shape)


def _fwd_rule(x, scale, bias, eps):
    return _fwd_impl(x, scale, bias, eps), (x, scale)


def _bwd_rule(eps, res, g):
    x, scale = res
    c = x.shape[-1]
    n = 1
    for d in x.shape[:-1]:
        n *= d
    block = _pick_block(n)
    if not block or not _supported(n, c, block):
        # Differentiate the XLA fallback directly.
        def f(x_, s_, b_):
            return _xla_ln(x_, s_, b_, eps)

        _, vjp = jax.vjp(f, x, scale, jnp.zeros((c,), scale.dtype))
        return vjp(g)
    xf = x.reshape(n, c)
    gf = g.reshape(n, c)
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
    )(xf, scale.reshape(1, c), gf)
    return (
        dx.reshape(x.shape),
        ds.reshape(c).astype(scale.dtype),
        db.reshape(c).astype(scale.dtype),
    )


fused_layer_norm.defvjp(_fwd_rule, _bwd_rule)


class FusedLayerNorm(nn.Module):
    """Drop-in for flax.linen.LayerNorm(dtype=f32) with torch eps parity.

    Same param names ("scale"/"bias") and shapes, so checkpoints are
    interchangeable with nn.LayerNorm. epsilon defaults to 1e-5 — the
    torch nn.LayerNorm default the reference uses (:505-507, :684);
    flax's default is 1e-6, a quiet divergence this class also fixes for
    the fallback path. Output is in the input dtype (the consumers cast
    to bf16 anyway; under reference AMP semantics downstream ops run
    bf16 too).

    On-hardware verdict (chain9 A/B, runs/r3_tpu_log9.txt): the Pallas
    LN kernel LOST 8% at the b64 flagship (910 vs 992 imgs/s) — the
    custom-call boundary costs more scheduling/fusion than the fp32
    copies it saves. XLA LN is therefore the default;
    MOEGAN_FUSED_LN=1 opts the kernel back in. Net round-3 kernel rule:
    Pallas wins where there's MXU work to fuse around (MoE FFN, flash
    attention), loses on pure elementwise/reduction ops at these sizes.
    """

    epsilon: float = 1e-5
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.use_pallas and os.environ.get("MOEGAN_FUSED_LN", "0") == "1":
            return fused_layer_norm(x, scale, bias, self.epsilon)
        return _xla_ln(x, scale, bias, self.epsilon)
