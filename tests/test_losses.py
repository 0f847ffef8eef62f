"""Loss parity: softplus GAN losses, CV balance loss, schedules
(reference t2i_moe_gan.py:909-1000, :1168-1178)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from moegan_tpu.losses.gan import (
    discriminator_loss,
    generator_loss,
    kl_annealing_factor,
    moe_balance_loss,
    r1_penalty,
    temperature_factor,
)


def test_gan_losses_match_torch_softplus():
    rng = np.random.default_rng(0)
    rp = rng.normal(size=(8,)).astype(np.float32)
    fp = rng.normal(size=(8,)).astype(np.float32)
    mp = rng.normal(size=(8,)).astype(np.float32)
    want_d = (
        F.softplus(-torch.from_numpy(rp)).mean()
        + F.softplus(torch.from_numpy(fp)).mean()
        + F.softplus(torch.from_numpy(mp)).mean()
    ).item()
    want_g = F.softplus(-torch.from_numpy(fp)).mean().item()
    assert float(discriminator_loss(jnp.asarray(rp), jnp.asarray(fp), jnp.asarray(mp))) == pytest.approx(want_d, rel=1e-6)
    assert float(generator_loss(jnp.asarray(fp))) == pytest.approx(want_g, rel=1e-6)


def _torch_balance(last_probs, balance_weight=0.01):
    """Literal transcription of the reference formula (:951-1000)."""
    t = torch.from_numpy(last_probs)
    eps = 1e-6
    num_experts = t.size(1)
    load = t.sum(dim=0) + eps
    fraction = load / t.size(0)
    mean_usage = torch.mean(fraction)
    std_usage = torch.std(fraction)
    cv = std_usage / (mean_usage + eps)
    bl = torch.clamp(num_experts * cv, 0.0, 10.0)
    return (balance_weight * bl).item()


def test_balance_loss_matches_reference_formula():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(50, 4)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    got = float(moe_balance_loss([jnp.asarray(probs)], 0.01))
    assert got == pytest.approx(_torch_balance(probs), rel=1e-5)


def test_balance_loss_uses_last_block_and_handles_empty():
    rng = np.random.default_rng(2)
    a = rng.dirichlet(np.ones(4), 30).astype(np.float32)
    b = rng.dirichlet(np.ones(4) * 0.1, 30).astype(np.float32)
    got = float(moe_balance_loss([jnp.asarray(a), jnp.asarray(b)], 1.0))
    assert got == pytest.approx(_torch_balance(b, 1.0), rel=1e-4)
    assert float(moe_balance_loss([], 1.0)) == 0.0


def test_switch_balance_minimized_at_uniform_dispatch():
    """kind="switch" = Switch aux loss E*sum(f_i*P_i): exactly 1.0 when
    hard dispatch is uniform, > 1.0 when argmax collapses — even when the
    soft probs are near-uniform (temperature-annealed), where the CV term
    reads ~0 and misses the collapse."""
    E = 4
    # Near-uniform soft probs whose argmax ALWAYS lands on expert 0.
    skew = np.full((64, E), 0.2475, np.float32)
    skew[:, 0] = 0.2575
    got_cv = float(moe_balance_loss([jnp.asarray(skew)], 1.0, kind="cv"))
    got_sw = float(moe_balance_loss([jnp.asarray(skew)], 1.0, kind="switch"))
    assert got_cv < 0.1  # CV can't see it
    assert got_sw == pytest.approx(E * 0.2575, rel=1e-5)  # f=[1,0,0,0]

    # Uniform hard dispatch -> exactly 1.0.
    eye = np.tile(np.eye(E, dtype=np.float32), (16, 1))
    assert float(moe_balance_loss([jnp.asarray(eye)], 1.0, kind="switch")) == pytest.approx(1.0)


def test_switch_balance_gradient_pushes_toward_uniform():
    """d/dP of E*sum(f*P) is E*f (through the soft probs only): the
    overloaded expert's mean prob is pushed down."""
    E = 4
    logits = jnp.asarray(np.random.default_rng(7).normal(size=(32, E)), jnp.float32)
    logits = logits.at[:, 0].add(3.0)  # collapse onto expert 0

    def loss(lg):
        return moe_balance_loss([jax.nn.softmax(lg, -1)], 1.0, kind="switch")

    g = jax.grad(loss)(logits)
    assert bool(jnp.all(jnp.isfinite(g)))
    # Expert-0 logits get positive gradient (descent lowers them).
    assert float(jnp.mean(g[:, 0])) > 0.0


def test_r1_penalty_closed_form():
    """D(x) = sum(a * x) has constant gradient a -> R1 = gamma/2 * ||a||^2."""
    a = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4, 4, 3)).astype(np.float32))
    d = lambda imgs: jnp.sum(imgs * a, axis=(1, 2, 3))
    x = jnp.ones((5, 4, 4, 3))
    got = float(r1_penalty(d, x, r1_gamma=10.0))
    want = 5.0 * float(jnp.sum(a**2))
    assert got == pytest.approx(want, rel=1e-5)


def test_schedules_match_reference_curves():
    # KL warmup: epoch 0 -> ~1e-5; epoch >= K -> 1.0 (ref :1170-1174)
    assert float(kl_annealing_factor(0, 5)) == pytest.approx(1e-5, rel=1e-3)
    assert float(kl_annealing_factor(5, 5)) == pytest.approx(1.0)
    assert float(kl_annealing_factor(3, 5)) == pytest.approx(1e-5 + (1 - 1e-5) * 0.36, rel=1e-5)
    # temperature: max(1, 3 - 0.1 * epoch) (ref :1178)
    assert float(temperature_factor(0)) == 3.0
    assert float(temperature_factor(10)) == 2.0
    assert float(temperature_factor(50)) == 1.0
