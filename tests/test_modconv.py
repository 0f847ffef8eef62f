"""ModulatedConv: the input-scaling form must equal the reference's
per-sample-weight grouped conv (t2i_moe_gan.py:154-186) exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moegan_tpu.core.modconv import ModulatedConv


@pytest.fixture(scope="module")
def setup():
    m = ModulatedConv(out_channels=6, kernel_size=3, compute_dtype=jnp.float32)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 5, 5, 4))
    w = jax.random.normal(jax.random.fold_in(k, 1), (2, 16))
    params = m.init(k, x, w)
    return m, params, x, w


def _reference_form(params, x, w, demodulate=True):
    """Naive per-sample modulated-weight conv (the reference's math)."""
    p = params["params"]
    weight = np.asarray(p["weight"])  # [kh, kw, cin, cout]
    style = np.asarray(w) @ np.asarray(p["mod_kernel"]) + np.asarray(p["mod_bias"])
    xn = np.asarray(x)
    B, H, W, Cin = xn.shape
    kh, kw, _, Cout = weight.shape
    out = np.zeros((B, H, W, Cout), np.float32)
    for b in range(B):
        wb = weight * style[b][None, None, :, None]  # modulate
        if demodulate:
            d = 1.0 / np.sqrt((wb**2).sum(axis=(0, 1, 2)) + 1e-8)
            wb = wb * d[None, None, None, :]
        xp = np.pad(xn[b], ((1, 1), (1, 1), (0, 0)))
        for i in range(H):
            for j in range(W):
                patch = xp[i : i + kh, j : j + kw, :]
                out[b, i, j] = np.einsum("hwc,hwco->o", patch, wb)
    return out


def test_matches_per_sample_weight_conv(setup):
    m, params, x, w = setup
    got = np.asarray(m.apply(params, x, w))
    want = _reference_form(params, x, w)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_1x1_matmul_path_matches_reference(setup):
    """kernel_size=1 takes the channel-matmul fast path (no conv op);
    must still equal the per-sample-weight formulation exactly."""
    _, _, x, w = setup
    k = jax.random.PRNGKey(7)
    m1 = ModulatedConv(out_channels=6, kernel_size=1, compute_dtype=jnp.float32)
    params1 = m1.init(k, x, w)
    got = np.asarray(m1.apply(params1, x, w))

    p = params1["params"]
    weight = np.asarray(p["weight"])  # [1, 1, cin, cout]
    style = np.asarray(w) @ np.asarray(p["mod_kernel"]) + np.asarray(p["mod_bias"])
    want = np.zeros(got.shape, np.float32)
    for b in range(x.shape[0]):
        wb = weight * style[b][None, None, :, None]
        d = 1.0 / np.sqrt((wb**2).sum(axis=(0, 1, 2)) + 1e-8)
        wb = wb * d[None, None, None, :]
        want[b] = np.einsum("hwc,co->hwo", np.asarray(x)[b], wb[0, 0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_upsample_doubles_spatial(setup):
    _, params, x, w = setup
    m2 = ModulatedConv(out_channels=6, kernel_size=3, upsample=True, compute_dtype=jnp.float32)
    y = m2.apply(params, x, w)
    assert y.shape == (2, 10, 10, 6)


def test_no_demodulate(setup):
    _, _, x, w = setup
    m = ModulatedConv(out_channels=6, kernel_size=3, demodulate=False, compute_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, w)
    got = np.asarray(m.apply(params, x, w))
    want = _reference_form(params, x, w, demodulate=False)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_s2d_packed_conv_matches_direct():
    """MOEGAN_S2D_CONV=1 (space-to-depth packed 3x3 conv) must be
    numerically identical to the direct conv — forward and gradients."""
    import os
    from unittest import mock

    import jax
    import jax.numpy as jnp
    import numpy as np

    from moegan_tpu.core.modconv import ModulatedConv

    mod = ModulatedConv(24, 3, compute_dtype=jnp.float32)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 8, 16))
    w = jax.random.normal(jax.random.fold_in(k, 1), (2, 512))
    params = mod.init(k, x, w)

    def loss(p, x, w):
        out = mod.apply(p, x, w)
        return jnp.sum(out ** 2), out

    with mock.patch.dict(os.environ, {"MOEGAN_S2D_CONV": "0"}):
        (l0, out0), g0 = jax.value_and_grad(loss, has_aux=True)(params, x, w)
    with mock.patch.dict(os.environ, {"MOEGAN_S2D_CONV": "1"}):
        (l1, out1), g1 = jax.value_and_grad(loss, has_aux=True)(params, x, w)

    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        # conv-transpose summation order differs between the two paths
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-4)


def test_s2d_gate_heuristics():
    import os
    from unittest import mock

    from moegan_tpu.core.modconv import _s2d_wanted

    with mock.patch.dict(os.environ, {"MOEGAN_S2D_CONV": "1"}):
        assert _s2d_wanted(64, 64, 32, 3)
        assert not _s2d_wanted(64, 64, 32, 1)   # 1x1 convs stay direct
        assert not _s2d_wanted(63, 63, 32, 3)   # odd spatial dims
    with mock.patch.dict(os.environ, {"MOEGAN_S2D_CONV": "0"}):
        assert not _s2d_wanted(64, 64, 32, 3)
    with mock.patch.dict(os.environ, {"MOEGAN_S2D_CONV": "auto"}):
        # CPU backend in tests -> auto never engages
        assert not _s2d_wanted(64, 64, 32, 3)
