"""Self/cross attention block with a SparseMoE FFN.

Reference: t2i_moe_gan.py:493-576. proj_in (1x1 modulated conv) ->
LayerNorm + self-MHA (8 heads) -> text projection + cross-MHA against the
(length-1) projected text sequence -> LayerNorm + SparseMoE FFN residual ->
proj_out. We keep the exact residual topology (residuals bypass the norms,
and the MoE residual adds onto the *post-cross-attention* features, :571).

The self-attention optionally runs through the fused Pallas
flash-attention kernel (ops/flash_attention.py) — the spatial token count
reaches 4096 at 64x64 where avoiding the HBM-materialized [T,T] scores
matrix matters.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.core import inits
from moegan_tpu.core.modconv import ModulatedConv
from moegan_tpu.core.moe import SparseMoE
from moegan_tpu.ops.fused_layernorm import FusedLayerNorm


def _xavier_uniform():
    return nn.initializers.xavier_uniform()


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (batch_first, packed QKV)."""

    dim: int
    heads: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        """q: [B, Tq, D]; k/v: [B, Tk, D]. Returns [B, Tq, D]."""
        D, H = self.dim, self.heads
        hd = D // H
        cd = self.compute_dtype

        wq = self.param("wq", _xavier_uniform(), (D, D))
        wk = self.param("wk", _xavier_uniform(), (D, D))
        wv = self.param("wv", _xavier_uniform(), (D, D))
        bq = self.param("bq", inits.constant(0.0), (D,))
        bk = self.param("bk", inits.constant(0.0), (D,))
        bv = self.param("bv", inits.constant(0.0), (D,))
        wo = self.param("wo", inits.torch_linear_kernel(), (D, D))
        bo = self.param("bo", inits.constant(0.0), (D,))

        def split(x, w, b):
            y = x.astype(cd) @ w.astype(cd) + b.astype(cd)
            B, T, _ = y.shape
            return y.reshape(B, T, H, hd)

        if (
            k is v
            and q is not k
            and k.shape[1] == 1
            and os.environ.get("MOEGAN_CROSS_T1", "1") != "0"
        ):
            # Single-KV-token cross attention (the reference's text
            # sequence is always length 1, t2i_moe_gan.py:790): softmax
            # over one key is EXACTLY 1.0 (exp(s-s)/exp(s-s)), so the
            # attention output is the value projection of that token,
            # broadcast over every query position — independent of q,
            # wq/bq, wk/bk, AND the LayerNorm feeding q (their reference
            # gradients are exactly zero: the softmax Jacobian
            # diag(p)-pp^T vanishes at p=1). Computing it as two
            # [B,1,D] matmuls + a broadcast deletes, per block per
            # generator pass, the q projection over all T tokens, the
            # [B,H,T,1] score/softmax/PV chain, the [B,T,D] out
            # projection, and (via XLA DCE of the now-unused q input)
            # the norm2 LayerNorm — all token-stream-sized ops the
            # reference pays because torch cannot see through the
            # softmax. Bit-identical to the full path (the full path's
            # p@v with p==1.0 returns v exactly; matmul rows with equal
            # inputs produce equal outputs). Parity + zero-grad tests:
            # tests/test_attention.py. MOEGAN_CROSS_T1=0 restores the
            # full path for A/B.
            vh = v.astype(cd) @ wv.astype(cd) + bv.astype(cd)  # [B, 1, D]
            out1 = vh @ wo.astype(cd) + bo.astype(cd)  # [B, 1, D]
            B, Tq = q.shape[0], q.shape[1]
            return jnp.broadcast_to(out1, (B, Tq, D)).astype(q.dtype)

        if q is k and k is v and os.environ.get("MOEGAN_FUSED_QKV", "1") != "0":
            # Self-attention: one [D, 3D] matmul instead of three [D, D]
            # (params stay separate — concat is trace-time). At the narrow
            # block widths (D=32/64) a [*, D]@[D, D] fills a quarter of
            # the 128-lane MXU output tile; 3x the width fills 3x more and
            # reads the activations once instead of three times. The split
            # is three LAST-DIM slices (a [B,T,3,H,hd] reshape+index here
            # cost two 50 MB layout-transpose copies in the compiled step,
            # round-3 HLO ranking).
            wqkv = jnp.concatenate([wq, wk, wv], axis=1).astype(cd)
            bqkv = jnp.concatenate([bq, bk, bv]).astype(cd)
            y = q.astype(cd) @ wqkv + bqkv
            B, T, _ = y.shape
            qh = y[..., :D].reshape(B, T, H, hd)
            kh = y[..., D : 2 * D].reshape(B, T, H, hd)
            vh = y[..., 2 * D :].reshape(B, T, H, hd)
        else:
            qh = split(q, wq, bq)
            kh = split(k, wk, bk)
            vh = split(v, wv, bv)

        min_t = int(os.environ.get("MOEGAN_FLASH_MIN_T", "256"))
        if self.use_pallas and qh.shape[1] >= min_t and qh.shape[1] == kh.shape[1]:
            from moegan_tpu.ops.flash_attention import flash_attention

            # Tile sizes tunable for perf experiments (trace-time env).
            # block_k default 4096 (single KV iteration at the res-64
            # T=4096): every halving of the KV-loop trip count won on
            # hardware — 1142.6 (512) -> 1206.9 (1024) in the round-3
            # sweep (runs/r3_tpu_log3.txt), then 998.26 (2048,
            # runs/r4_tpu_log6.txt) -> 1008.23 (4096, r4_tpu_log10.txt
            # item b) at the round-4 reference-exact b64 bench. 4096
            # needs the flash backward's raised 24 MB Mosaic limit (its
            # [block_q, block_k] fp32 score intermediates are 18.58 MB >
            # the 16 MB default, log9) — see
            # ops/flash_attention.py::_bwd_compiler_params. Block shapes
            # don't scale with batch (T is spatial), so no b128 trap.
            # block_q stays 256: 512 is a measured loser — its demand
            # expands with the limit (16.79 MB @ 16, 20.30 MB @ 20,
            # log6/log10 item a) and never fits.
            # MIN_T 256: with the reference-exact 8 heads at dim 128 the
            # res-16 XLA path materializes fp32 [B,8,256,256] score/prob
            # tensors (134 MB at b64) per pass; the flash kernel keeps
            # them in VMEM even at T=256.
            bq_t = int(os.environ.get("MOEGAN_FLASH_BQ", "256"))
            bk_t = int(os.environ.get("MOEGAN_FLASH_BK", "4096"))
            out = flash_attention(qh, kh, vh, bq_t, bk_t)
        else:
            # checkpoint: without it XLA saves the fp32 [B,H,T,T] score and
            # prob tensors as backward residuals (67 MB each at T=256/b64 —
            # among the largest buffers in the whole step, HLO attribution
            # in scripts/hlo_traffic.py); recomputing them in the backward
            # costs two tiny matmuls.
            @jax.checkpoint
            def _sdpa(qh, kh, vh):
                scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
                logits = jnp.einsum(
                    "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
                ) * scale
                probs = jax.nn.softmax(logits, axis=-1).astype(cd)
                return jnp.einsum(
                    "bhqk,bkhd->bqhd", probs, vh, preferred_element_type=jnp.float32
                )

            out = _sdpa(qh, kh, vh)

        B, Tq = q.shape[0], q.shape[1]
        out = out.reshape(B, Tq, D).astype(cd)
        return (out @ wo.astype(cd) + bo.astype(cd)).astype(q.dtype)


class AttentionBlock(nn.Module):
    dim: int
    text_dim: int = 512
    heads: int = 8
    num_experts: int = 4
    router_hidden: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, H, W, C]
        w: jax.Array,  # [B, latent]
        text_seq: jax.Array,  # [B, Tt, text_dim]
        *,
        training: bool = True,
        annealing_factor: jax.Array | float = 1.0,
    ):
        B, Hh, Ww, C = x.shape
        T = Hh * Ww

        x_in = ModulatedConv(C, 1, compute_dtype=self.compute_dtype, name="proj_in")(x, w)
        tokens = x_in.reshape(B, T, C)

        # Self-attention (pre-norm, residual bypasses the norm; ref :545-547).
        # FusedLayerNorm: torch-eps (1e-5) parity + single-pass Pallas LN
        # (the XLA path materialized fp32 + lane-transposed copies of the
        # token stream per norm — HLO traffic ranking, round 3).
        xn = FusedLayerNorm(use_pallas=self.use_pallas, name="norm1")(tokens)
        tokens = tokens + MultiHeadAttention(
            C, self.heads, self.compute_dtype, self.use_pallas, name="self_attn"
        )(xn, xn, xn)

        # Cross-attention to the projected text sequence (ref :550-555).
        tproj = nn.Dense(
            C,
            kernel_init=inits.torch_linear_kernel(),
            bias_init=inits.torch_linear_bias(self.text_dim),
            name="text_proj",
        )(text_seq)
        xn = FusedLayerNorm(use_pallas=self.use_pallas, name="norm2")(tokens)
        tokens = tokens + MultiHeadAttention(
            C, self.heads, self.compute_dtype, False, name="cross_attn"
        )(xn, tproj, tproj)

        # SparseMoE FFN on normalized tokens, residual on the un-normalized
        # stream (ref :561-571).
        xn = FusedLayerNorm(use_pallas=self.use_pallas, name="norm3")(tokens)
        moe_out, kl, probs = SparseMoE(
            dim=C,
            text_dim=w.shape[-1],
            num_experts=self.num_experts,
            router_hidden=self.router_hidden,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            name="moe",
        )(xn, w, training=training, annealing_factor=annealing_factor)
        tokens = tokens + moe_out

        x_sp = tokens.reshape(B, Hh, Ww, C)
        x_out = ModulatedConv(C, 1, compute_dtype=self.compute_dtype, name="proj_out")(x_sp, w)
        return x_out, kl, probs
