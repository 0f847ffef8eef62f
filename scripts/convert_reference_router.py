"""Convert the reference's trained Bayesian router checkpoint to JAX.

Loads /root/reference/moe/moe_results/bayesian_moe_model.pth (the one
genuinely trained piece of reference state shipped in-repo, torch-CPU
readable), converts it via moegan_tpu.prototype.convert, smoke-checks the
deterministic forward, and writes a flattened .npz + a meta JSON with the
9 cluster descriptions.

Usage: python scripts/convert_reference_router.py [--out runs/trained_router]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if repo not in sys.path:
    sys.path.insert(0, repo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", default=None, help="source .pth (default: reference)")
    ap.add_argument("--out", default="runs/trained_router")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from moegan_tpu.prototype.convert import (
        REFERENCE_ROUTER_PTH,
        load_reference_router,
    )
    from moegan_tpu.prototype.gating import BayesianMoEGatingNetwork

    variables, meta = load_reference_router(args.pth or REFERENCE_ROUTER_PTH)
    gating = BayesianMoEGatingNetwork(
        hidden_dim=meta["hidden_dim"], num_experts=meta["num_experts"]
    )
    x = np.random.RandomState(0).randn(4, meta["input_dim"]).astype(np.float32)
    probs, kl, logits = gating.apply(variables, x, sample=False)
    print("deterministic forward OK; argmax experts:", np.asarray(probs).argmax(1))

    os.makedirs(args.out, exist_ok=True)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(variables["params"])
    np.savez(
        os.path.join(args.out, "bayesian_router_params.npz"),
        **{"/".join(k): np.asarray(v) for k, v in flat.items()},
    )
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {args.out}/bayesian_router_params.npz + meta.json")
    for c in meta["clusters"]:
        print(" ", c)


if __name__ == "__main__":
    main()
