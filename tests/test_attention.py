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


def test_cross_t1_shortcut_matches_full_path():
    """MOEGAN_CROSS_T1 collapses length-1-KV cross attention to a
    broadcast value projection. It must match the full softmax path
    bitwise in forward, and in gradients up to fp32 reduction reorder
    (the shortcut sums dout over Tq BEFORE the wo/wv matmuls instead of
    after — same terms, different association). The full path's softmax
    over one key is exactly 1.0 and its Jacobian exactly 0, so q/k
    projections get exactly-zero grads either way."""
    import os

    D, H, B, Tq = 16, 4, 3, 7
    m = MultiHeadAttention(dim=D, heads=H, compute_dtype=jnp.float32)
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (B, Tq, D))
    kv = jax.random.normal(jax.random.fold_in(key, 1), (B, 1, D))
    params = m.init(key, q, kv, kv)
    g = jax.random.normal(jax.random.fold_in(key, 2), (B, Tq, D))

    def loss(p, flag):
        os.environ["MOEGAN_CROSS_T1"] = flag
        try:
            out = m.apply(p, q, kv, kv)
        finally:
            os.environ.pop("MOEGAN_CROSS_T1", None)
        return jnp.vdot(out, g), out

    (l_full, out_full), g_full = jax.value_and_grad(loss, has_aux=True)(params, "0")
    (l_fast, out_fast), g_fast = jax.value_and_grad(loss, has_aux=True)(params, "1")

    np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_fast))
    assert float(l_full) == float(l_fast)
    flat_full = jax.tree_util.tree_leaves_with_path(g_full)
    flat_fast = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(g_fast)}
    for path, leaf in flat_full:
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_fast[name]), rtol=2e-6,
            atol=1e-6, err_msg=name)
        if any(t in name for t in ("wq", "wk", "bq", "bk")):
            assert not np.any(np.asarray(leaf)), f"{name} grad must be exactly 0"
