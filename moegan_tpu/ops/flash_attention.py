"""Fused flash attention (Pallas, TPU).

Online-softmax attention that never materializes the [T, T] score matrix
in HBM — the TPU-native answer to the reference's nn.MultiheadAttention
over spatial tokens (t2i_moe_gan.py:545-555), which at the rebuilt 64x64
resolution would allocate B*H*4096^2 scores. Forward is a single Pallas
kernel (grid over batch*heads x query blocks, inner fori_loop over kv
blocks with running max/sum rescaling); backward uses the checkpointed
chunked-XLA path (O(blk*T) memory) via custom_vjp.

Layout: q, k, v are [B, T, H, D]; heads fold into the grid so each program
streams one query tile against the full K/V of its (batch, head) slice.
D stays in [8, 128]; tiles are (block_q x D) and (block_k x D).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moegan_tpu.ops.chunked_attention import chunked_attention

NEG_INF = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float):
    """One (batch*head, q-tile) program: online softmax over kv tiles.

    q_ref: [block_q, D]; k_ref/v_ref: [T, D]; o_ref: [block_q, D].
    """
    block_q, d = q_ref.shape
    t = k_ref.shape[0]
    n_kv = t // block_k

    # Keep Q/K/V in their storage dtype (bf16 in training) so the MXU runs
    # single-pass matmuls; accumulate in fp32 via preferred_element_type.
    q = q_ref[:]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]

        s = jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [block_q, block_k] fp32

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)

        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, *, block_q: int, block_k: int):
    B, T, H, D = q.shape
    sm_scale = 1.0 / math.sqrt(D)

    # Fold heads into the grid: [B*H, T, D].
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, T, D)

    qf, kf, vf = fold(q), fold(k), fold(v)

    grid = (B * H, T // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=block_k, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * D,
            bytes_accessed=(3 * B * H * T * D + B * H * T * D) * 2,
            transcendentals=B * H * T * T,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, T, D).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, block_q: int = 256, block_k: int = 512):
    """Fused attention: [B, T, H, D] x3 -> [B, T, H, D].

    Falls back to the chunked XLA path when shapes don't tile or when not
    running on TPU (e.g. CPU tests).
    """
    return _flash_impl(q, k, v, block_q, block_k)


def _supported(q, block_q, block_k) -> bool:
    B, T, H, D = q.shape
    if jax.default_backend() != "tpu":
        return False
    return T % block_q == 0 and T % block_k == 0 and D % 8 == 0 and D <= 256


def _flash_impl(q, k, v, block_q, block_k):
    block_q = min(block_q, q.shape[1])
    block_k = min(block_k, k.shape[1])
    if not _supported(q, block_q, block_k):
        return chunked_attention(q, k, v)
    return _flash_forward(q, k, v, block_q=block_q, block_k=block_k)


def _flash_fwd_rule(q, k, v, block_q, block_k):
    return _flash_impl(q, k, v, block_q, block_k), (q, k, v)


def _flash_bwd_rule(block_q, block_k, res, g):
    q, k, v = res
    # Memory-bounded recompute backward through the chunked formulation.
    _, vjp = jax.vjp(lambda q_, k_, v_: chunked_attention(q_, k_, v_), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
