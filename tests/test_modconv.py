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
