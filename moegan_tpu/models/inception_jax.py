"""InceptionV3 pool-2048 feature extractor in pure JAX (for FID).

The reference computes FID from torchvision ``inception_v3``
IMAGENET1K_V1 features with ``fc = Identity`` — i.e. the 2048-d global
average pool — resizing to 299x299 bilinear (align_corners=False) and
feeding [0,1] images through the model's ``transform_input`` remap
(/root/reference/moegan/inference.py:140-249). This module reproduces
that feature space TPU-natively:

- NHWC layout, all convs folded with their BatchNorms at conversion time
  (inference-only network => y = relu(conv(x) * s + b) with s,b absorbed
  into the conv weight/bias), so the hot path is pure conv+bias+relu —
  exactly what XLA fuses onto the MXU.
- ``variant="torchvision"`` (default, reference parity): avg-pool branches
  use count_include_pad=True and the input passes through torchvision's
  transform_input channel remap.
- ``variant="pytorch_fid"``: the pytorch-fid/TF-port behavior — avg-pool
  branches exclude padding from the divisor and Mixed_7c's pool branch is
  a max pool; inputs in [0,1] are mapped to [-1,1] (normalize_input).
- ``scripts/convert_inception.py`` converts a torchvision or pytorch-fid
  state_dict (.pth, loadable with the CPU torch in this image) into this
  module's .npz parameter file; ``load_inception_params`` falls back to
  deterministic random init when no weights are on disk (zero-egress
  environment), keeping the full FID protocol runnable and tested.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

INCEPTION_WEIGHTS_ENV = "INCEPTION_WEIGHTS_PATH"
FEATURE_DIM = 2048
INPUT_RESOLUTION = 299
BN_EPS = 0.001  # torchvision BasicConv2d BatchNorm eps


# ---------------------------------------------------------------------------
# Architecture table: every BasicConv2d as (name, kh, kw, cin, cout, stride,
# (pad_h, pad_w)). Stride/padding omitted = 1 / (0, 0) ("valid").
# ---------------------------------------------------------------------------

def _conv_specs() -> list[tuple]:
    specs: list[tuple] = [
        ("Conv2d_1a_3x3", 3, 3, 3, 32, 2, (0, 0)),
        ("Conv2d_2a_3x3", 3, 3, 32, 32, 1, (0, 0)),
        ("Conv2d_2b_3x3", 3, 3, 32, 64, 1, (1, 1)),
        ("Conv2d_3b_1x1", 1, 1, 64, 80, 1, (0, 0)),
        ("Conv2d_4a_3x3", 3, 3, 80, 192, 1, (0, 0)),
    ]

    def inception_a(prefix, cin, pool_features):
        specs.extend([
            (f"{prefix}.branch1x1", 1, 1, cin, 64, 1, (0, 0)),
            (f"{prefix}.branch5x5_1", 1, 1, cin, 48, 1, (0, 0)),
            (f"{prefix}.branch5x5_2", 5, 5, 48, 64, 1, (2, 2)),
            (f"{prefix}.branch3x3dbl_1", 1, 1, cin, 64, 1, (0, 0)),
            (f"{prefix}.branch3x3dbl_2", 3, 3, 64, 96, 1, (1, 1)),
            (f"{prefix}.branch3x3dbl_3", 3, 3, 96, 96, 1, (1, 1)),
            (f"{prefix}.branch_pool", 1, 1, cin, pool_features, 1, (0, 0)),
        ])
        return 64 + 64 + 96 + pool_features

    def inception_b(prefix, cin):
        specs.extend([
            (f"{prefix}.branch3x3", 3, 3, cin, 384, 2, (0, 0)),
            (f"{prefix}.branch3x3dbl_1", 1, 1, cin, 64, 1, (0, 0)),
            (f"{prefix}.branch3x3dbl_2", 3, 3, 64, 96, 1, (1, 1)),
            (f"{prefix}.branch3x3dbl_3", 3, 3, 96, 96, 2, (0, 0)),
        ])
        return 384 + 96 + cin

    def inception_c(prefix, cin, c7):
        specs.extend([
            (f"{prefix}.branch1x1", 1, 1, cin, 192, 1, (0, 0)),
            (f"{prefix}.branch7x7_1", 1, 1, cin, c7, 1, (0, 0)),
            (f"{prefix}.branch7x7_2", 1, 7, c7, c7, 1, (0, 3)),
            (f"{prefix}.branch7x7_3", 7, 1, c7, 192, 1, (3, 0)),
            (f"{prefix}.branch7x7dbl_1", 1, 1, cin, c7, 1, (0, 0)),
            (f"{prefix}.branch7x7dbl_2", 7, 1, c7, c7, 1, (3, 0)),
            (f"{prefix}.branch7x7dbl_3", 1, 7, c7, c7, 1, (0, 3)),
            (f"{prefix}.branch7x7dbl_4", 7, 1, c7, c7, 1, (3, 0)),
            (f"{prefix}.branch7x7dbl_5", 1, 7, c7, 192, 1, (0, 3)),
            (f"{prefix}.branch_pool", 1, 1, cin, 192, 1, (0, 0)),
        ])
        return 192 * 4

    def inception_d(prefix, cin):
        specs.extend([
            (f"{prefix}.branch3x3_1", 1, 1, cin, 192, 1, (0, 0)),
            (f"{prefix}.branch3x3_2", 3, 3, 192, 320, 2, (0, 0)),
            (f"{prefix}.branch7x7x3_1", 1, 1, cin, 192, 1, (0, 0)),
            (f"{prefix}.branch7x7x3_2", 1, 7, 192, 192, 1, (0, 3)),
            (f"{prefix}.branch7x7x3_3", 7, 1, 192, 192, 1, (3, 0)),
            (f"{prefix}.branch7x7x3_4", 3, 3, 192, 192, 2, (0, 0)),
        ])
        return 320 + 192 + cin

    def inception_e(prefix, cin):
        specs.extend([
            (f"{prefix}.branch1x1", 1, 1, cin, 320, 1, (0, 0)),
            (f"{prefix}.branch3x3_1", 1, 1, cin, 384, 1, (0, 0)),
            (f"{prefix}.branch3x3_2a", 1, 3, 384, 384, 1, (0, 1)),
            (f"{prefix}.branch3x3_2b", 3, 1, 384, 384, 1, (1, 0)),
            (f"{prefix}.branch3x3dbl_1", 1, 1, cin, 448, 1, (0, 0)),
            (f"{prefix}.branch3x3dbl_2", 3, 3, 448, 384, 1, (1, 1)),
            (f"{prefix}.branch3x3dbl_3a", 1, 3, 384, 384, 1, (0, 1)),
            (f"{prefix}.branch3x3dbl_3b", 3, 1, 384, 384, 1, (1, 0)),
            (f"{prefix}.branch_pool", 1, 1, cin, 192, 1, (0, 0)),
        ])
        return 320 + 2 * 384 + 2 * 384 + 192

    c = inception_a("Mixed_5b", 192, 32)
    c = inception_a("Mixed_5c", c, 64)
    c = inception_a("Mixed_5d", c, 64)
    c = inception_b("Mixed_6a", c)
    c = inception_c("Mixed_6b", c, 128)
    c = inception_c("Mixed_6c", c, 160)
    c = inception_c("Mixed_6d", c, 160)
    c = inception_c("Mixed_6e", c, 192)
    c = inception_d("Mixed_7a", c)
    c = inception_e("Mixed_7b", c)
    c = inception_e("Mixed_7c", c)
    assert c == FEATURE_DIM
    return specs


CONV_SPECS = _conv_specs()
_SPEC_BY_NAME = {s[0]: s for s in CONV_SPECS}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv(params: dict, name: str, x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Folded BasicConv2d: conv (no bias in torch; bias here = folded BN)
    + ReLU. Weight layout HWIO."""
    _, kh, kw, cin, cout, stride, pad = _SPEC_BY_NAME[name]
    p = params[name]
    w = p["w"].astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w,
        window_strides=(stride, stride),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(out + p["b"].astype(jnp.float32))


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avg_pool_3x3_s1_p1(x, count_include_pad: bool):
    """3x3 stride-1 pad-1 average pool, the branch_pool op of blocks A/C/E.

    count_include_pad=True divides by 9 everywhere (torch F.avg_pool2d
    default, what torchvision InceptionV3 uses); False divides by the
    number of in-bounds taps (the pytorch-fid patch)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    if count_include_pad:
        return summed / 9.0
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / counts


def _block_a(params, prefix, x, cd, fid_pool):
    b1 = _conv(params, f"{prefix}.branch1x1", x, cd)
    b5 = _conv(params, f"{prefix}.branch5x5_1", x, cd)
    b5 = _conv(params, f"{prefix}.branch5x5_2", b5, cd)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_1", x, cd)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_2", b3, cd)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_3", b3, cd)
    bp = _avg_pool_3x3_s1_p1(x, count_include_pad=not fid_pool)
    bp = _conv(params, f"{prefix}.branch_pool", bp, cd)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(params, prefix, x, cd):
    b3 = _conv(params, f"{prefix}.branch3x3", x, cd)
    bd = _conv(params, f"{prefix}.branch3x3dbl_1", x, cd)
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", bd, cd)
    bd = _conv(params, f"{prefix}.branch3x3dbl_3", bd, cd)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(params, prefix, x, cd, fid_pool):
    b1 = _conv(params, f"{prefix}.branch1x1", x, cd)
    b7 = _conv(params, f"{prefix}.branch7x7_1", x, cd)
    b7 = _conv(params, f"{prefix}.branch7x7_2", b7, cd)
    b7 = _conv(params, f"{prefix}.branch7x7_3", b7, cd)
    bd = _conv(params, f"{prefix}.branch7x7dbl_1", x, cd)
    for i in (2, 3, 4, 5):
        bd = _conv(params, f"{prefix}.branch7x7dbl_{i}", bd, cd)
    bp = _avg_pool_3x3_s1_p1(x, count_include_pad=not fid_pool)
    bp = _conv(params, f"{prefix}.branch_pool", bp, cd)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(params, prefix, x, cd):
    b3 = _conv(params, f"{prefix}.branch3x3_1", x, cd)
    b3 = _conv(params, f"{prefix}.branch3x3_2", b3, cd)
    b7 = _conv(params, f"{prefix}.branch7x7x3_1", x, cd)
    b7 = _conv(params, f"{prefix}.branch7x7x3_2", b7, cd)
    b7 = _conv(params, f"{prefix}.branch7x7x3_3", b7, cd)
    b7 = _conv(params, f"{prefix}.branch7x7x3_4", b7, cd)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(params, prefix, x, cd, fid_pool, max_pool_branch):
    b1 = _conv(params, f"{prefix}.branch1x1", x, cd)
    b3 = _conv(params, f"{prefix}.branch3x3_1", x, cd)
    b3 = jnp.concatenate(
        [
            _conv(params, f"{prefix}.branch3x3_2a", b3, cd),
            _conv(params, f"{prefix}.branch3x3_2b", b3, cd),
        ],
        axis=-1,
    )
    bd = _conv(params, f"{prefix}.branch3x3dbl_1", x, cd)
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", bd, cd)
    bd = jnp.concatenate(
        [
            _conv(params, f"{prefix}.branch3x3dbl_3a", bd, cd),
            _conv(params, f"{prefix}.branch3x3dbl_3b", bd, cd),
        ],
        axis=-1,
    )
    if max_pool_branch:
        # pytorch-fid Mixed_7c patch: TF inception max-pools here.
        bp = _max_pool(x, window=3, stride=1, pad=1)
    else:
        bp = _avg_pool_3x3_s1_p1(x, count_include_pad=not fid_pool)
    bp = _conv(params, f"{prefix}.branch_pool", bp, cd)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _transform_input(x01: jax.Array) -> jax.Array:
    """torchvision transform_input remap. The reference feeds [0,1] images
    to a model built with pretrained weights (=> transform_input=True), so
    this remap is part of the reference's effective feature function."""
    ch0 = x01[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
    ch1 = x01[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
    ch2 = x01[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
    return jnp.concatenate([ch0, ch1, ch2], axis=-1)


def features(
    params: dict,
    images_m11: jax.Array,
    *,
    variant: str = "torchvision",
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """[-1,1] NHWC images (any square size) -> pool-2048 features [B, 2048].

    Preprocessing mirrors the reference exactly (inference.py:184-186 then
    :172-175): clamp to [0,1], bilinear resize to 299 (align_corners=False
    == jax.image.resize half-pixel centers), channel remap per variant.
    """
    fid = variant == "pytorch_fid"
    x01 = jnp.clip((images_m11.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
    B = x01.shape[0]
    if x01.shape[1] != INPUT_RESOLUTION:
        x01 = jax.image.resize(
            x01, (B, INPUT_RESOLUTION, INPUT_RESOLUTION, 3), method="bilinear"
        )
    x = (2.0 * x01 - 1.0) if fid else _transform_input(x01)

    cd = compute_dtype
    x = _conv(params, "Conv2d_1a_3x3", x, cd)
    x = _conv(params, "Conv2d_2a_3x3", x, cd)
    x = _conv(params, "Conv2d_2b_3x3", x, cd)
    x = _max_pool(x)
    x = _conv(params, "Conv2d_3b_1x1", x, cd)
    x = _conv(params, "Conv2d_4a_3x3", x, cd)
    x = _max_pool(x)
    x = _block_a(params, "Mixed_5b", x, cd, fid)
    x = _block_a(params, "Mixed_5c", x, cd, fid)
    x = _block_a(params, "Mixed_5d", x, cd, fid)
    x = _block_b(params, "Mixed_6a", x, cd)
    x = _block_c(params, "Mixed_6b", x, cd, fid)
    x = _block_c(params, "Mixed_6c", x, cd, fid)
    x = _block_c(params, "Mixed_6d", x, cd, fid)
    x = _block_c(params, "Mixed_6e", x, cd, fid)
    x = _block_d(params, "Mixed_7a", x, cd)
    x = _block_e(params, "Mixed_7b", x, cd, fid, max_pool_branch=False)
    x = _block_e(params, "Mixed_7c", x, cd, fid, max_pool_branch=fid)
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 2048]


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def fold_batchnorm(
    conv_w_oihw: np.ndarray,
    bn_gamma: np.ndarray,
    bn_beta: np.ndarray,
    bn_mean: np.ndarray,
    bn_var: np.ndarray,
    eps: float = BN_EPS,
) -> tuple[np.ndarray, np.ndarray]:
    """Fold an inference BatchNorm into the preceding (bias-free) conv.

    relu(BN(conv(x))) == relu(conv'(x) + b') with w' = w * s (per output
    channel), b' = beta - mean * s, s = gamma / sqrt(var + eps). Returns
    (w_hwio, bias)."""
    s = bn_gamma / np.sqrt(bn_var + eps)
    w = conv_w_oihw * s[:, None, None, None]
    return w.transpose(2, 3, 1, 0).astype(np.float32), (bn_beta - bn_mean * s).astype(np.float32)


def init_inception_params(seed: int = 0) -> dict:
    """Deterministic random init (no pretrained weights on disk): keeps the
    FID protocol runnable end-to-end; semantic values need real weights."""
    rng = np.random.default_rng(seed)
    params = {}
    for name, kh, kw, cin, cout, _, _ in CONV_SPECS:
        fan_in = kh * kw * cin
        params[name] = {
            "w": jnp.asarray(
                rng.normal(0.0, np.sqrt(2.0 / fan_in), (kh, kw, cin, cout)), jnp.float32
            ),
            "b": jnp.zeros((cout,), jnp.float32),
        }
    return params


def load_inception_params(path: Optional[str] = None, seed: int = 0) -> dict:
    """Load converted params (.npz from scripts/convert_inception.py) or
    fall back to deterministic random init."""
    path = path or os.environ.get(INCEPTION_WEIGHTS_ENV)
    if path and os.path.exists(path):
        flat = np.load(path)
        params: dict = {}
        for key in flat.files:
            name, kind = key.rsplit("/", 1)
            params.setdefault(name, {})[kind] = jnp.asarray(flat[key])
        missing = [s[0] for s in CONV_SPECS if s[0] not in params]
        if missing:
            raise ValueError(f"inception weights at {path} missing layers: {missing[:5]}")
        return params
    return init_inception_params(seed)


def save_inception_params(params: dict, path: str) -> None:
    flat = {}
    for name, p in params.items():
        flat[f"{name}/w"] = np.asarray(p["w"])
        flat[f"{name}/b"] = np.asarray(p["b"])
    np.savez(path, **flat)
