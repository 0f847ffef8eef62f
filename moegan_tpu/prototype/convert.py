"""Convert the reference's TRAINED Bayesian router checkpoint to JAX params.

The reference repo checks in one piece of genuinely trained state:
``moe/moe_results/bayesian_moe_model.pth`` — a ``MixtureOfExperts`` state
dict whose only parameters are its ``gating_network`` (a 512->256x5->9
``BayesianMoEGatingNetwork``, moe/moe_model.py:126-167), trained on CLIP
embeddings of COCO captions with the 9 clusters named in
``moe/moe_results/cluster_descriptions.txt``.

This module maps that torch state dict onto
``prototype.gating.BayesianMoEGatingNetwork`` flax params:

    gating_network.bayesian_layer<k>.weight_mu  [out,in] -> layer<k>/w_mu [in,out]
    gating_network.bayesian_layer<k>.weight_rho [out,in] -> layer<k>/w_rho [in,out]
    gating_network.bayesian_layer<k>.bias_mu    [out]    -> layer<k>/b_mu
    gating_network.bayesian_layer<k>.bias_rho   [out]    -> layer<k>/b_rho
    gating_network.text_projection.{weight,bias}         -> text_projection/{kernel.T,bias}

Parity with the torch forward is asserted in tests/test_torch_parity.py
(deterministic sample=False pass and the HMC predict_expert behavior at
the reference's 0.7 threshold, moe/moe_model.py:414-446).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

_LAYERS = ("layer1", "layer2", "layer2a", "layer2b", "layer2c", "layer3")

REFERENCE_ROUTER_PTH = "/root/reference/moe/moe_results/bayesian_moe_model.pth"
REFERENCE_CLUSTERS_TXT = "/root/reference/moe/moe_results/cluster_descriptions.txt"


def convert_gating_state_dict(sd: Mapping[str, Any]) -> dict:
    """torch state dict (tensors or arrays) -> flax variables dict.

    Accepts keys with or without the ``gating_network.`` wrapper prefix
    (the checked-in checkpoint was saved from the enclosing
    ``MixtureOfExperts`` module, so it carries the prefix).
    Returns ``{"params": {...}}`` ready for
    ``BayesianMoEGatingNetwork.apply``.
    """
    arrs = {}
    for k, v in sd.items():
        if k.startswith("gating_network."):
            k = k[len("gating_network."):]
        arrs[k] = np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)

    params: dict = {}
    for name in _LAYERS:
        tname = f"bayesian_{name}"
        params[name] = {
            "w_mu": arrs[f"{tname}.weight_mu"].T,
            "w_rho": arrs[f"{tname}.weight_rho"].T,
            "b_mu": arrs[f"{tname}.bias_mu"],
            "b_rho": arrs[f"{tname}.bias_rho"],
        }
    if "text_projection.weight" in arrs:
        params["text_projection"] = {
            "kernel": arrs["text_projection.weight"].T,
            "bias": arrs["text_projection.bias"],
        }
    return {"params": params}


def load_reference_router(path: str = REFERENCE_ROUTER_PTH):
    """Load + convert the reference checkpoint. Returns (variables, meta)
    where meta carries the inferred dims and the cluster descriptions
    (empty list if the sidecar txt is absent)."""
    import os

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    variables = convert_gating_state_dict(sd)
    p = variables["params"]
    meta = {
        "input_dim": p["layer1"]["w_mu"].shape[0],
        "hidden_dim": p["layer1"]["w_mu"].shape[1],
        "num_experts": p["layer3"]["w_mu"].shape[1],
        "use_text": "text_projection" in p,
        "clusters": [],
    }
    txt = os.path.join(os.path.dirname(path), "cluster_descriptions.txt")
    if os.path.exists(txt):
        with open(txt) as f:
            meta["clusters"] = [ln.strip() for ln in f if ln.strip()]
    return variables, meta
