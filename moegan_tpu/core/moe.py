"""Per-pixel sparse Mixture-of-Experts FFN with a Bayesian router.

Reference: t2i_moe_gan.py:249-263 (expert = Linear(d->4d)-GELU-Linear(4d->d))
and :426-491 (SparseMoE: reshape [B,C,H,W] -> per-pixel tokens, route with
the style vector as conditioning, dense soft mixture over all experts in
training :465-470, hard top-1 dispatch at inference :471-483).

TPU-native design:
- Expert weights are stacked along a leading E axis ([E, C, 4C] etc.) so
  the expert dimension is a shardable mesh axis (PartitionSpec('expert')).
  The dense mixture is E large batched matmuls — exactly what the MXU
  wants — instead of a Python loop over nn.Linear modules.
- The inference path keeps static shapes: top-1 one-hot probabilities fed
  through the same mixture contraction produce bit-identical outputs to
  the reference's boolean-mask dispatch (sum_e onehot_e * expert_e(x) =
  expert_argmax(x)), with no data-dependent shapes.
- Optionally the whole block (router projection + softmax + expert FFN +
  combine) runs as a single fused Pallas kernel (ops/fused_moe.py).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from moegan_tpu.core import inits
from moegan_tpu.core.router import BayesianRouter
from moegan_tpu.parallel.sharding import constrain


class SparseExpertFFN(nn.Module):
    """A single expert FFN (only used standalone in tests; SparseMoE uses
    the stacked-weight formulation below)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(
            self.dim * 4,
            kernel_init=inits.torch_linear_kernel(),
            bias_init=inits.torch_linear_bias(self.dim),
        )(x)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default = exact
        return nn.Dense(
            self.dim,
            kernel_init=inits.torch_linear_kernel(),
            bias_init=inits.torch_linear_bias(self.dim * 4),
        )(h)


class SparseMoE(nn.Module):
    dim: int
    text_dim: int
    num_experts: int = 4
    router_hidden: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False

    def setup(self):
        d, e = self.dim, self.num_experts
        self.w1 = self.param("w1", inits.torch_linear_kernel(), (e, d, 4 * d))
        self.b1 = self.param("b1", inits.torch_linear_bias(d), (e, 4 * d))
        self.w2 = self.param("w2", inits.torch_linear_kernel(), (e, 4 * d, d))
        self.b2 = self.param("b2", inits.torch_linear_bias(4 * d), (e, d))
        self.router = BayesianRouter(
            feature_dim=d,
            text_dim=self.text_dim,
            num_experts=e,
            hidden=self.router_hidden,
        )

    def __call__(
        self,
        x: jax.Array,  # [B, T, C] per-pixel tokens (pre-normalized)
        w: jax.Array,  # [B, latent] style vector conditioning
        *,
        training: bool = True,
        annealing_factor: jax.Array | float = 1.0,
    ):
        """Returns (out [B,T,C], kl scalar, probs [B,T,E])."""
        if self.use_pallas and self._expert_mesh() is not None:
            out, probs = self._fused_sharded(x, w, training, annealing_factor)
        elif self.use_pallas:
            out, probs = self._fused(x, w, training, annealing_factor)
        else:
            probs, _ = self.router(
                x, w, sampling=training, hard=not training,
                annealing_factor=annealing_factor,
            )
            out = self._mixture(x, probs)

        kl = self.router.kl_divergence() if training else jnp.zeros((), jnp.float32)
        return out, kl, probs

    def _expert_mesh(self):
        """The ambient mesh when it carries a >1-sized 'expert' axis."""
        m = jax.sharding.get_abstract_mesh()
        if (
            m is not None
            and "expert" in m.axis_names
            and m.shape["expert"] > 1
            and self.num_experts % m.shape["expert"] == 0
        ):
            return m
        return None

    def _fused_sharded(self, x, w, training, annealing_factor):
        """Expert-parallel fused path: XLA router + shard_map'd Pallas FFN.

        The router (tiny [T,C]x[C,h]x[h,E] matmuls) runs in plain XLA over
        the full expert dimension; the heavy FFN+combine runs as the
        probs-as-input Pallas kernel inside a shard_map over the
        (data, expert) mesh — each chip computes only its local expert
        shard's partial sum, and the combine is one psum over the ICI
        'expert' axis. This keeps the fused-kernel wins under expert
        parallelism (reference MoE contract: t2i_moe_gan.py:465-491).
        """
        from jax.sharding import PartitionSpec as P

        from moegan_tpu.ops.fused_moe import moe_ffn_combine

        mesh = self._expert_mesh()
        probs, _ = self.router(
            x, w, sampling=training, hard=not training,
            annealing_factor=annealing_factor,
        )

        B, T, C = x.shape
        cd = self.compute_dtype
        tokens = x.reshape(B * T, C).astype(cd)
        pt = probs.reshape(B * T, self.num_experts).astype(jnp.float32)

        # Per-shard token count must tile block_t for the Pallas kernel
        # (ops/fused_moe._pallas_supported requires T % block_t == 0), so
        # pad the global token axis to a (dp * block_t) multiple — zero
        # probs => zero partials, so padding is exact. For small inputs
        # shrink block_t to one 16-row-aligned tile per shard (16 = bf16
        # sublane tile) instead of padding to 256, keeping the kernel
        # engaged without an 8x pad blowup.
        dp = mesh.shape.get("data", 1)
        n = tokens.shape[0]
        per = -(-n // dp)  # ceil per-shard token count
        block_t = 256 if per >= 256 else max(16, -(-per // 16) * 16)
        quantum = dp * block_t
        pad = (-n) % quantum
        if C % 8:  # the only remaining silent-fallback trigger on TPU
            import warnings

            warnings.warn(
                f"expert-sharded MoE with C={C} (not a multiple of 8) falls "
                "back to the XLA einsum path inside shard_map"
            )
        if pad:
            tokens = jnp.pad(tokens, ((0, pad), (0, 0)))
            pt = jnp.pad(pt, ((0, pad), (0, 0)))

        def body(tok, p, w1, b1, w2, b2):
            part = moe_ffn_combine(tok, p, w1, b1, w2, b2, block_t)
            return jax.lax.psum(part, "expert")

        out = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P("data", None),
                P("data", "expert"),
                P("expert", None, None),
                P("expert", None),
                P("expert", None, None),
                P("expert", None),
            ),
            out_specs=P("data", None),
        )(
            tokens, pt,
            self.w1.astype(cd), self.b1.astype(jnp.float32),
            self.w2.astype(cd), self.b2.astype(jnp.float32),
        )
        out = out[:n].reshape(B, T, C).astype(x.dtype)
        return out, probs

    def _fused(self, x, w, training, annealing_factor):
        """Single fused Pallas kernel: router + dispatch + expert FFN.

        Same math as router(...) + _mixture(...): sampled (or mean) router
        weights, per-image text contribution precomputed and broadcast per
        token, temperature clamping, then the fused kernel.
        """
        from moegan_tpu.ops.fused_moe import fused_moe_ffn

        B, T, C = x.shape
        h = self.router_hidden

        fw, tw, cw = self.router.sample_weights(training)
        xt = jnp.nan_to_num(x.astype(jnp.float32), nan=0.0, posinf=1.0, neginf=-1.0)
        wt = jnp.nan_to_num(w.astype(jnp.float32), nan=0.0, posinf=1.0, neginf=-1.0)

        text_logits = (wt @ tw) @ cw[h:]  # [B, E]
        text_tok = jnp.broadcast_to(text_logits[:, None, :], (B, T, self.num_experts))

        eff_temp = jnp.clip(self.router.temperature[0] * annealing_factor, 0.5, 5.0)
        inv_temp = 1.0 / eff_temp

        tokens = xt.reshape(B * T, C).astype(self.compute_dtype)
        tl = text_tok.reshape(B * T, self.num_experts).astype(jnp.float32)

        # Pad the token axis to the kernel tile size; sliced off below.
        block_t = 256
        n = tokens.shape[0]
        pad = (-n) % min(block_t, n) if n else 0
        if pad:
            tokens = jnp.pad(tokens, ((0, pad), (0, 0)))
            tl = jnp.pad(tl, ((0, pad), (0, 0)))

        out, probs = fused_moe_ffn(
            tokens, fw.astype(self.compute_dtype), cw[:h].astype(jnp.float32),
            tl, inv_temp,
            self.w1.astype(self.compute_dtype), self.b1.astype(jnp.float32),
            self.w2.astype(self.compute_dtype), self.b2.astype(jnp.float32),
            not training, block_t,
        )
        out = out[:n].reshape(B, T, C).astype(x.dtype)
        probs = probs[:n].reshape(B, T, self.num_experts)
        return out, probs

    def _mixture(self, x: jax.Array, probs: jax.Array) -> jax.Array:
        """Dense mixture over all experts: sum_e p_e * FFN_e(x).

        Expert-parallel: with w1/w2 sharded over the 'expert' mesh axis the
        per-expert matmuls run sharded and the final combine reduces over
        the expert axis via an XLA psum — the ICI-native equivalent of an
        all-to-all dispatch for this dense-mixture regime.
        """
        cd = self.compute_dtype
        xc = x.astype(cd)
        w1 = constrain(self.w1.astype(cd), ("expert", None, None))
        b1 = constrain(self.b1.astype(cd), ("expert", None))
        w2 = constrain(self.w2.astype(cd), ("expert", None, None))
        b2 = constrain(self.b2.astype(cd), ("expert", None))

        # [E, B, T, 4C]: E batched matmuls on the MXU. The step is HBM-
        # bandwidth-bound, so the big [E,B,T,4C] intermediate stays in the
        # compute dtype (bf16) — the MXU still accumulates each matmul in
        # fp32 internally; only the stored activation is half-width.
        h = jnp.einsum("btc,ecf->ebtf", xc, w1)
        h = h + b1[:, None, None, :]
        h = constrain(h, ("expert", None, None, None))
        h = nn.gelu(h, approximate=False)
        y = jnp.einsum("ebtf,efc->ebtc", h, w2)
        y = y + b2[:, None, None, :]
        y = constrain(y, ("expert", None, None, None))

        # Weighted combine; reduces over E (psum over 'expert' when
        # sharded). fp32 accumulation for the cross-expert reduction.
        out = jnp.einsum(
            "bte,ebtc->btc", probs.astype(cd), y, preferred_element_type=jnp.float32
        )
        return out.astype(x.dtype)
