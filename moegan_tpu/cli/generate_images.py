"""Image generation CLI — mirror of reference moegan/generate_images.py
(:12-24 flag surface): load a checkpoint (wrapped or bare params, :31-40),
sample images for a prompt, save a grid png named after the prompt
(:53-67)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Generate images from text")
    p.add_argument("--model_path", type=str, required=True,
                   help="checkpoint: orbax dir, .msgpack, or .npz")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--truncation_psi", type=float, default=0.7)
    p.add_argument("--output_dir", type=str, default=".")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_resolution", type=int, default=64)
    p.add_argument("--show_experts", action="store_true",
                   help="print expert-utilization stats")
    return p


def save_grid(images_m11: np.ndarray, path: str):
    """Tile [N,H,W,3] images into one grid PNG."""
    from PIL import Image

    arr = np.clip((images_m11 + 1.0) * 127.5, 0, 255).astype(np.uint8)
    n, h, w, _ = arr.shape
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, img in enumerate(arr):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    Image.fromarray(grid).save(path)


def main(argv=None):
    args = build_parser().parse_args(argv)

    from moegan_tpu.config import GeneratorConfig
    from moegan_tpu.infer.sample import Sampler
    from moegan_tpu.utils.checkpoint import load_generator_params

    full = {4: 512, 8: 256, 16: 128, 32: 64, 64: 32}
    cfg = GeneratorConfig(
        max_resolution=args.max_resolution,
        channels={k: v for k, v in full.items() if k <= args.max_resolution},
    )
    g_params = load_generator_params(args.model_path)
    sampler = Sampler(cfg, g_params)
    images, stats = sampler(
        args.prompt, args.num_samples, args.truncation_psi,
        seed=args.seed, return_stats=True,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    fname = "_".join(args.prompt.split())[:64] + ".png"  # ref :60
    out_path = os.path.join(args.output_dir, fname)
    save_grid(np.asarray(images), out_path)
    print(f"saved {args.num_samples} samples to {out_path}")
    if args.show_experts:
        import json

        print(json.dumps(stats, indent=2))
    return out_path


if __name__ == "__main__":
    main()
