"""Prompt-to-image sampling (reference sample_aurora_gan, t2i_moe_gan.py
:1672-1709): z ~ N(0,1) fp32, CLIP-encode string prompts, repeat a single
embedding across samples, eval-mode forward (mean router weights, hard
top-1 routing), truncation trick, clamp to [-1,1]. Adds the expert-
utilization stats the north star asks for (per-block top-1 histogram)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from moegan_tpu.config import GeneratorConfig
from moegan_tpu.models.generator import AuroraGenerator


class Sampler:
    """Jitted, reusable sampling wrapper around a trained generator."""

    def __init__(self, cfg: GeneratorConfig, g_params, clip_params=None):
        self.cfg = cfg
        self.gen = AuroraGenerator(cfg)
        self.g_params = g_params
        self.clip_params = clip_params

        @partial(jax.jit, static_argnames=("truncation_psi",))
        def _sample(params, z, text_emb, truncation_psi):
            out = self.gen.apply(
                {"params": params}, z, text_emb,
                truncation_psi=truncation_psi, training=False,
            )
            return jnp.clip(out.image, -1.0, 1.0), out.routing

        self._sample = _sample

        @jax.jit
        def _sample_vec(params, z, text_emb, psi):
            # psi is a traced per-sample [B] vector — one compiled shape
            # serves every psi mix (the serving micro-batcher's dispatch).
            out = self.gen.apply(
                {"params": params}, z, text_emb,
                truncation_psi=psi, training=False,
            )
            return jnp.clip(out.image, -1.0, 1.0), out.routing

        self._sample_vec = _sample_vec

    def encode_text(self, prompt) -> jax.Array:
        if self.clip_params is None:
            from moegan_tpu.models.clip_jax import load_clip_params

            self.clip_params = load_clip_params()
        if isinstance(self.clip_params, dict) and "toy" in self.clip_params:
            # From-scratch tower pack (models/toy_clip.py) — same
            # structural dispatch as losses/clip_loss.py.
            from moegan_tpu.models.toy_clip import encode_text

            return encode_text(self.clip_params["toy"], prompt)
        from moegan_tpu.models.clip_jax import encode_text

        return encode_text(self.clip_params, prompt)

    def __call__(
        self,
        prompt: Union[str, list, jax.Array, np.ndarray],
        num_samples: int = 1,
        truncation_psi: float = 0.7,
        seed: int = 0,
        return_stats: bool = False,
    ):
        if isinstance(prompt, str) or (
            isinstance(prompt, list) and prompt and isinstance(prompt[0], str)
        ):
            text_emb = self.encode_text(prompt).astype(jnp.float32)
        else:
            text_emb = jnp.asarray(prompt, jnp.float32)
            if text_emb.ndim == 1:
                text_emb = text_emb[None]
        if text_emb.shape[0] == 1 and num_samples > 1:
            text_emb = jnp.broadcast_to(text_emb, (num_samples, text_emb.shape[-1]))

        z = jax.random.normal(
            jax.random.PRNGKey(seed), (num_samples, self.cfg.latent_dim), jnp.float32
        )
        images, routing = self._sample(self.g_params, z, text_emb, truncation_psi)
        if not return_stats:
            return images
        stats = expert_utilization_stats(routing)
        return images, stats


    def sample_raw(
        self,
        z: jax.Array,          # [N, latent_dim]
        text_emb: jax.Array,   # [N, text_embedding_dim]
        psi: jax.Array,        # [N] per-sample truncation
    ):
        """One fixed-shape dispatch over a pre-assembled batch (serving
        micro-batcher path). Returns (images [N,R,R,3] in [-1,1],
        routing tuple of [N, T_r, E])."""
        return self._sample_vec(
            self.g_params,
            jnp.asarray(z, jnp.float32),
            jnp.asarray(text_emb, jnp.float32),
            jnp.asarray(psi, jnp.float32),
        )


def expert_utilization_stats(routing) -> dict:
    """Per-block expert histograms from (hard) routing probs — the
    observability signal the reference prototype plots
    (moe/moe_testing.py:127-177)."""
    out = {}
    for i, probs in enumerate(routing):
        p = np.asarray(probs, np.float32).reshape(-1, probs.shape[-1])
        counts = np.bincount(p.argmax(-1), minlength=p.shape[-1])
        out[f"block_{i}"] = {
            "mean_prob": p.mean(0).tolist(),
            "top1_fraction": (counts / len(p)).tolist(),
        }
    return out


def sample_aurora_gan(
    generator_params,
    text_prompt,
    num_samples: int = 1,
    truncation_psi: float = 0.7,
    *,
    cfg: Optional[GeneratorConfig] = None,
    clip_params=None,
    seed: int = 0,
):
    """Functional mirror of the reference API (:1672). Returns [N,R,R,3]
    images in [-1, 1] (NHWC, float32). With cfg=None the architecture is
    recovered from the param shapes rather than assumed flagship."""
    if cfg is None:
        from moegan_tpu.utils.checkpoint import infer_generator_config

        cfg = infer_generator_config(generator_params)
    sampler = Sampler(cfg, generator_params, clip_params)
    return sampler(text_prompt, num_samples, truncation_psi, seed)
