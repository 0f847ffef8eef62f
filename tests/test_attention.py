"""MultiHeadAttention parity vs torch.nn.MultiheadAttention — the exact
module the reference uses for self/cross attention (t2i_moe_gan.py:513-516).
Weights are copied across frameworks; outputs must match in fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from moegan_tpu.core.attention import MultiHeadAttention


def test_parity_with_torch_mha():
    D, H, B, Tq, Tk = 16, 4, 2, 6, 3
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, Tq, D)).astype(np.float32)
    kv = rng.normal(size=(B, Tk, D)).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    tmha.eval()

    m = MultiHeadAttention(dim=D, heads=H, compute_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))

    # Copy torch weights into the flax params (torch in_proj packs QKV rows).
    ipw = tmha.in_proj_weight.detach().numpy()  # [3D, D]
    ipb = tmha.in_proj_bias.detach().numpy()
    opw = tmha.out_proj.weight.detach().numpy()  # [D, D]
    opb = tmha.out_proj.bias.detach().numpy()
    p = {
        "wq": ipw[:D].T, "wk": ipw[D : 2 * D].T, "wv": ipw[2 * D :].T,
        "bq": ipb[:D], "bk": ipb[D : 2 * D], "bv": ipb[2 * D :],
        "wo": opw.T, "bo": opb,
    }
    params = {"params": jax.tree_util.tree_map(jnp.asarray, p)}

    got = np.asarray(m.apply(params, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv)))
    with torch.no_grad():
        want, _ = tmha(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def test_single_kv_token_cross_attention():
    """The reference's cross-attention runs against a length-1 text
    sequence (:790) — softmax over one key must reduce to V projection."""
    D, H = 8, 2
    m = MultiHeadAttention(dim=D, heads=H, compute_dtype=jnp.float32)
    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (2, 5, D))
    kv = jax.random.normal(jax.random.fold_in(k, 1), (2, 1, D))
    params = m.init(k, q, kv, kv)
    out = np.asarray(m.apply(params, q, kv, kv))
    # every query position receives the same value -> rows identical
    np.testing.assert_allclose(out[:, 0], out[:, 3], rtol=1e-5, atol=1e-6)
