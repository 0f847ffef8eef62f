#!/usr/bin/env python
"""Convert a pretrained CLIP ViT-B/32 checkpoint into moegan_tpu's format.

Accepts either the OpenAI `clip` package state dict (ViT-B-32.pt jit
archive's state_dict) or the HuggingFace openai/clip-vit-base-patch32
layout (pytorch_model.bin / model.safetensors), and writes a flattened
.npz that models/clip_jax.load_clip_params() consumes. Run once wherever
weights are available, then set CLIP_WEIGHTS_PATH=<out.npz>.

Usage:
  python scripts/convert_clip.py --src /path/to/hf_or_openai_ckpt --out clip_vitb32.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def _load_state_dict(src: str) -> dict:
    if src.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(src)
    import torch

    obj = torch.load(src, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


def _is_hf(sd: dict) -> bool:
    return any(k.startswith("text_model.") or k.startswith("vision_model.") for k in sd)


def convert_openai(sd: dict) -> dict:
    """OpenAI clip-package naming -> flat {tower/module/param: array}."""
    out = {}
    # image tower
    out["image/patch_embed/kernel"] = np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0))
    out["image/class_embedding"] = sd["visual.class_embedding"]
    out["image/positional_embedding"] = sd["visual.positional_embedding"]
    out["image/ln_pre/scale"] = sd["visual.ln_pre.weight"]
    out["image/ln_pre/bias"] = sd["visual.ln_pre.bias"]
    out["image/ln_post/scale"] = sd["visual.ln_post.weight"]
    out["image/ln_post/bias"] = sd["visual.ln_post.bias"]
    out["image/proj"] = sd["visual.proj"]
    for i in range(12):
        p = f"visual.transformer.resblocks.{i}"
        q = f"image/block_{i}"
        out[f"{q}/ln_1/scale"] = sd[f"{p}.ln_1.weight"]
        out[f"{q}/ln_1/bias"] = sd[f"{p}.ln_1.bias"]
        out[f"{q}/ln_2/scale"] = sd[f"{p}.ln_2.weight"]
        out[f"{q}/ln_2/bias"] = sd[f"{p}.ln_2.bias"]
        out[f"{q}/qkv/kernel"] = sd[f"{p}.attn.in_proj_weight"].T
        out[f"{q}/qkv/bias"] = sd[f"{p}.attn.in_proj_bias"]
        out[f"{q}/out/kernel"] = sd[f"{p}.attn.out_proj.weight"].T
        out[f"{q}/out/bias"] = sd[f"{p}.attn.out_proj.bias"]
        out[f"{q}/mlp_fc/kernel"] = sd[f"{p}.mlp.c_fc.weight"].T
        out[f"{q}/mlp_fc/bias"] = sd[f"{p}.mlp.c_fc.bias"]
        out[f"{q}/mlp_proj/kernel"] = sd[f"{p}.mlp.c_proj.weight"].T
        out[f"{q}/mlp_proj/bias"] = sd[f"{p}.mlp.c_proj.bias"]
    # text tower
    out["text/token_embedding"] = sd["token_embedding.weight"]
    out["text/positional_embedding"] = sd["positional_embedding"]
    out["text/ln_final/scale"] = sd["ln_final.weight"]
    out["text/ln_final/bias"] = sd["ln_final.bias"]
    out["text/text_projection"] = sd["text_projection"]
    for i in range(12):
        p = f"transformer.resblocks.{i}"
        q = f"text/block_{i}"
        out[f"{q}/ln_1/scale"] = sd[f"{p}.ln_1.weight"]
        out[f"{q}/ln_1/bias"] = sd[f"{p}.ln_1.bias"]
        out[f"{q}/ln_2/scale"] = sd[f"{p}.ln_2.weight"]
        out[f"{q}/ln_2/bias"] = sd[f"{p}.ln_2.bias"]
        out[f"{q}/qkv/kernel"] = sd[f"{p}.attn.in_proj_weight"].T
        out[f"{q}/qkv/bias"] = sd[f"{p}.attn.in_proj_bias"]
        out[f"{q}/out/kernel"] = sd[f"{p}.attn.out_proj.weight"].T
        out[f"{q}/out/bias"] = sd[f"{p}.attn.out_proj.bias"]
        out[f"{q}/mlp_fc/kernel"] = sd[f"{p}.mlp.c_fc.weight"].T
        out[f"{q}/mlp_fc/bias"] = sd[f"{p}.mlp.c_fc.bias"]
        out[f"{q}/mlp_proj/kernel"] = sd[f"{p}.mlp.c_proj.weight"].T
        out[f"{q}/mlp_proj/bias"] = sd[f"{p}.mlp.c_proj.bias"]
    return out


def convert_hf(sd: dict) -> dict:
    """HF transformers CLIPModel naming -> flat layout."""
    out = {}
    v = "vision_model"
    out["image/patch_embed/kernel"] = np.transpose(
        sd[f"{v}.embeddings.patch_embedding.weight"], (2, 3, 1, 0)
    )
    out["image/class_embedding"] = sd[f"{v}.embeddings.class_embedding"].reshape(-1)
    out["image/positional_embedding"] = sd[f"{v}.embeddings.position_embedding.weight"]
    out["image/ln_pre/scale"] = sd[f"{v}.pre_layrnorm.weight"]
    out["image/ln_pre/bias"] = sd[f"{v}.pre_layrnorm.bias"]
    out["image/ln_post/scale"] = sd[f"{v}.post_layernorm.weight"]
    out["image/ln_post/bias"] = sd[f"{v}.post_layernorm.bias"]
    out["image/proj"] = sd["visual_projection.weight"].T

    def block(src_prefix, dst_prefix, i):
        p = f"{src_prefix}.encoder.layers.{i}"
        q = f"{dst_prefix}/block_{i}"
        wq = sd[f"{p}.self_attn.q_proj.weight"]
        wk = sd[f"{p}.self_attn.k_proj.weight"]
        wv = sd[f"{p}.self_attn.v_proj.weight"]
        bq = sd[f"{p}.self_attn.q_proj.bias"]
        bk = sd[f"{p}.self_attn.k_proj.bias"]
        bv = sd[f"{p}.self_attn.v_proj.bias"]
        out[f"{q}/qkv/kernel"] = np.concatenate([wq, wk, wv], 0).T
        out[f"{q}/qkv/bias"] = np.concatenate([bq, bk, bv], 0)
        out[f"{q}/out/kernel"] = sd[f"{p}.self_attn.out_proj.weight"].T
        out[f"{q}/out/bias"] = sd[f"{p}.self_attn.out_proj.bias"]
        out[f"{q}/ln_1/scale"] = sd[f"{p}.layer_norm1.weight"]
        out[f"{q}/ln_1/bias"] = sd[f"{p}.layer_norm1.bias"]
        out[f"{q}/ln_2/scale"] = sd[f"{p}.layer_norm2.weight"]
        out[f"{q}/ln_2/bias"] = sd[f"{p}.layer_norm2.bias"]
        out[f"{q}/mlp_fc/kernel"] = sd[f"{p}.mlp.fc1.weight"].T
        out[f"{q}/mlp_fc/bias"] = sd[f"{p}.mlp.fc1.bias"]
        out[f"{q}/mlp_proj/kernel"] = sd[f"{p}.mlp.fc2.weight"].T
        out[f"{q}/mlp_proj/bias"] = sd[f"{p}.mlp.fc2.bias"]

    for i in range(12):
        block("vision_model", "image", i)
        block("text_model", "text", i)

    t = "text_model"
    out["text/token_embedding"] = sd[f"{t}.embeddings.token_embedding.weight"]
    out["text/positional_embedding"] = sd[f"{t}.embeddings.position_embedding.weight"]
    out["text/ln_final/scale"] = sd[f"{t}.final_layer_norm.weight"]
    out["text/ln_final/bias"] = sd[f"{t}.final_layer_norm.bias"]
    out["text/text_projection"] = sd["text_projection.weight"].T
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sd = _load_state_dict(args.src)
    flat = convert_hf(sd) if _is_hf(sd) else convert_openai(sd)
    np.savez(args.out, **{k: np.asarray(v, np.float32) for k, v in flat.items()})
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
