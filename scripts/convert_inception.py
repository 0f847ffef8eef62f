#!/usr/bin/env python
"""Convert a torchvision / pytorch-fid InceptionV3 state_dict to JAX .npz.

The reference's FID uses torchvision inception_v3 IMAGENET1K_V1 pool-2048
features (/root/reference/moegan/inference.py:161-208). This converts that
checkpoint (inception_v3_google-*.pth, or pytorch-fid's
pt_inception-2015-12-05-*.pth) into the folded-BN .npz that
moegan_tpu.models.inception_jax.load_inception_params() consumes: every
BasicConv2d's BatchNorm is folded into the conv (w' = w*gamma/sqrt(var+eps),
b' = beta - mean*..., HWIO layout). AuxLogits/fc are dropped — FID only
needs the pool features.

Run once wherever the weights exist, then set
INCEPTION_WEIGHTS_PATH=<out.npz>.

Usage:
  python scripts/convert_inception.py --src inception_v3_google.pth --out inception_fid.npz
"""

from __future__ import annotations

import argparse

import numpy as np

from moegan_tpu.models.inception_jax import CONV_SPECS, fold_batchnorm


def _load_state_dict(src: str) -> dict:
    import torch

    obj = torch.load(src, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach() if hasattr(v, "detach") else v) for k, v in obj.items()}


def convert(sd: dict) -> dict:
    """torch state_dict -> {"<layer>/w": HWIO, "<layer>/b": [out]} flat dict."""
    # pytorch-fid wraps the torchvision model; strip an "inception." prefix
    # if present so both layouts convert.
    prefixes = ("", "inception.")
    flat = {}
    for name, kh, kw, cin, cout, _, _ in CONV_SPECS:
        for pre in prefixes:
            wk = f"{pre}{name}.conv.weight"
            if wk in sd:
                break
        else:
            raise KeyError(f"missing conv weight for layer {name}")
        base = f"{pre}{name}"
        w, b = fold_batchnorm(
            sd[f"{base}.conv.weight"],
            sd[f"{base}.bn.weight"],
            sd[f"{base}.bn.bias"],
            sd[f"{base}.bn.running_mean"],
            sd[f"{base}.bn.running_var"],
        )
        assert w.shape == (kh, kw, cin, cout), (name, w.shape)
        flat[f"{name}/w"] = w
        flat[f"{name}/b"] = b
    return flat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="torch .pth state_dict")
    ap.add_argument("--out", required=True, help="output .npz")
    args = ap.parse_args()

    flat = convert(_load_state_dict(args.src))
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays -> {args.out}")


if __name__ == "__main__":
    main()
