"""Memory-bounded attention via query-block scanning (pure XLA).

Differentiable fallback for platforms without Pallas (CPU tests) and the
reference backward for the fused kernel: jax.checkpoint per query block
keeps peak memory at O(blk_q * T) instead of O(T^2) while XLA recomputes
block probabilities during the backward pass.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def chunked_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, block_q: int = 512
) -> jax.Array:
    """q, k, v: [B, T, H, D] -> [B, T, H, D]; softmax over keys in fp32."""
    B, T, H, D = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    block_q = min(block_q, T)
    if T % block_q != 0:
        block_q = T  # tiny/odd sizes: single block

    qb = q.reshape(B, T // block_q, block_q, H, D)

    @jax.checkpoint
    def one_block(q_blk):
        # q_blk: [B, blk, H, D]
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q_blk, k, preferred_element_type=jnp.float32
        ) * scale
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)

    out = jax.lax.map(lambda blk: one_block(blk), jnp.swapaxes(qb, 0, 1))
    out = jnp.swapaxes(out, 0, 1).reshape(B, T, H, D)
    return out.astype(q.dtype)
