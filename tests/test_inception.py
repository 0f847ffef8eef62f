"""InceptionV3 pool-2048 FID feature path (reference feature space,
/root/reference/moegan/inference.py:140-249): architecture shapes, BN
folding math, pooling variants, converter round-trip, and Frechet-distance
golden values on closed-form Gaussians."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.infer.fid import (
    FIDEvaluator,
    frechet_distance,
    gaussian_stats,
    inception_feature_extractor,
)
from moegan_tpu.models import inception_jax as inc


@pytest.fixture(scope="module")
def params():
    return inc.init_inception_params(0)


def test_feature_shape_and_determinism(params):
    imgs = np.tanh(np.random.default_rng(0).normal(size=(2, 64, 64, 3))).astype(np.float32)
    f1 = np.asarray(inc.features(params, jnp.asarray(imgs)))
    f2 = np.asarray(inc.features(params, jnp.asarray(imgs)))
    assert f1.shape == (2, inc.FEATURE_DIM)
    np.testing.assert_array_equal(f1, f2)
    assert np.isfinite(f1).all()


def test_variants_differ(params):
    """torchvision vs pytorch-fid variants use different pooling and input
    remap — they must not produce identical features."""
    imgs = jnp.asarray(
        np.tanh(np.random.default_rng(1).normal(size=(1, 32, 32, 3))).astype(np.float32)
    )
    tv = np.asarray(inc.features(params, imgs, variant="torchvision"))
    pf = np.asarray(inc.features(params, imgs, variant="pytorch_fid"))
    assert not np.allclose(tv, pf)


def test_conv_spec_channel_chain():
    """Each stage's input channels must match the previous stage's concat
    output (the architecture table is internally consistent; forward would
    fail otherwise, this pins the numbers)."""
    by_name = {s[0]: s for s in inc.CONV_SPECS}
    # Mixed_5b consumes the 192-ch stem; produces 64+64+96+32 = 256.
    assert by_name["Mixed_5b.branch1x1"][3] == 192
    assert by_name["Mixed_5c.branch1x1"][3] == 256
    assert by_name["Mixed_5d.branch1x1"][3] == 288
    assert by_name["Mixed_6b.branch1x1"][3] == 768
    # Mixed_7a (D) out = 320+192+768 = 1280; Mixed_7b (E) out = 2048.
    assert by_name["Mixed_7b.branch1x1"][3] == 1280
    assert by_name["Mixed_7c.branch1x1"][3] == 2048


def test_fold_batchnorm_golden():
    """Folded conv+bias == conv -> batchnorm computed by hand."""
    rng = np.random.default_rng(2)
    w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)  # OIHW
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = rng.uniform(0.1, 2.0, 8).astype(np.float32)
    x = rng.normal(size=(1, 6, 6, 4)).astype(np.float32)

    wf, bf = inc.fold_batchnorm(w, gamma, beta, mean, var)
    folded = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wf), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bf

    raw = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bn = (np.asarray(raw) - mean) / np.sqrt(var + inc.BN_EPS) * gamma + beta
    np.testing.assert_allclose(np.asarray(folded), bn, rtol=2e-4, atol=2e-4)


def test_avg_pool_variants_golden():
    """count_include_pad semantics against hand-computed corner values."""
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    inc_pad = np.asarray(inc._avg_pool_3x3_s1_p1(x, count_include_pad=True))
    exc_pad = np.asarray(inc._avg_pool_3x3_s1_p1(x, count_include_pad=False))
    # corner: 4 in-bounds ones over 9 taps vs over 4 taps
    assert abs(inc_pad[0, 0, 0, 0] - 4.0 / 9.0) < 1e-6
    assert abs(exc_pad[0, 0, 0, 0] - 1.0) < 1e-6
    # center: all 9 taps in bounds — identical
    assert abs(inc_pad[0, 1, 1, 0] - 1.0) < 1e-6
    assert abs(exc_pad[0, 1, 1, 0] - 1.0) < 1e-6


def test_converter_roundtrip(tmp_path, params):
    """A synthetic torchvision-named state_dict converts into params that
    reproduce conv->BN math, and save/load round-trips."""
    torch = pytest.importorskip("torch")
    from scripts.convert_inception import convert

    rng = np.random.default_rng(3)
    sd = {}
    for name, kh, kw, cin, cout, _, _ in inc.CONV_SPECS:
        sd[f"{name}.conv.weight"] = torch.tensor(
            rng.normal(0, 0.05, (cout, cin, kh, kw)).astype(np.float32)
        )
        sd[f"{name}.bn.weight"] = torch.tensor(rng.uniform(0.5, 1.5, cout).astype(np.float32))
        sd[f"{name}.bn.bias"] = torch.tensor(rng.normal(0, 0.1, cout).astype(np.float32))
        sd[f"{name}.bn.running_mean"] = torch.tensor(rng.normal(0, 0.1, cout).astype(np.float32))
        sd[f"{name}.bn.running_var"] = torch.tensor(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    flat = convert({k: np.asarray(v) for k, v in sd.items()})
    assert len(flat) == 2 * len(inc.CONV_SPECS)

    out = tmp_path / "inception.npz"
    np.savez(out, **flat)
    loaded = inc.load_inception_params(str(out))
    imgs = jnp.asarray(rng.normal(0, 0.3, (1, 32, 32, 3)).astype(np.float32))
    feats = np.asarray(inc.features(loaded, imgs))
    assert feats.shape == (1, 2048) and np.isfinite(feats).all()


def test_frechet_distance_golden():
    """Closed form: FID(N(0,I), N(m, s^2 I)) = ||m||^2 + D*(s-1)^2."""
    d = 4
    mu1, s1 = np.zeros(d), np.eye(d)
    mu2 = np.full(d, 2.0)
    s2 = np.eye(d) * 4.0  # s = 2
    expected = d * 2.0**2 + d * (2.0 - 1.0) ** 2
    assert abs(frechet_distance(mu1, s1, mu2, s2) - expected) < 1e-6
    assert abs(frechet_distance(mu1, s1, mu1, s1)) < 1e-6


def test_fid_evaluator_inception_default(params, tmp_path):
    """Default FIDEvaluator uses pool-2048 features, the identity fallback
    is 2048-d (ref :230-240), and identical image sets give FID ~ 0."""
    ev = FIDEvaluator(inception_feature_extractor(params, batch_size=4))
    imgs = np.tanh(np.random.default_rng(5).normal(size=(8, 32, 32, 3))).astype(np.float32)
    ev.set_reference_images(imgs)
    assert ev.ref_mu.shape == (2048,)
    assert abs(ev(imgs)) < 1e-2

    ev2 = FIDEvaluator(inception_feature_extractor(params, batch_size=4))
    ev2.load_reference_stats(str(tmp_path / "missing.npz"))
    assert ev2.ref_mu.shape == (2048,) and ev2.ref_sigma.shape == (2048, 2048)


def test_gaussian_stats_matches_numpy():
    x = np.random.default_rng(6).normal(size=(100, 5))
    mu, sig = gaussian_stats(x)
    np.testing.assert_allclose(mu, x.mean(0))
    np.testing.assert_allclose(sig, np.cov(x, rowvar=False))
