"""Orbax checkpointing with full resume — an upgrade over the reference.

The reference's in-loop checkpointing is commented out
(t2i_moe_gan.py:1478-1493, :1641-1652) and only a final
{generator, discriminator} dict is saved (sagemaker_train.py:297-301);
there is NO resume path (SURVEY.md §5). Here every checkpoint carries
G/D params + both optimizer states + step/epoch, and loading tolerates
the reference's dual formats ({'generator': ..., 'discriminator': ...}
wrapper or bare params) like inference.py:34-105 does.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from moegan_tpu.train.state import TrainState

# Model-math version, bumped whenever a change alters outputs WITHOUT
# changing param shapes (so old checkpoints load cleanly but silently
# produce different numbers). History:
#   1 — rounds 1-2.
#   2 — round 3: heads_for(dim>=128) 4->8, LayerNorm eps 1e-6->1e-5
#       (reference-parity fixes, PARITY.md), where-select NaN skip
#       (changes the optimizer-state tree vs apply_if_finite).
# Stored as a sidecar file (not inside the orbax tree) so restoring
# pre-versioning checkpoints keeps working.
MODEL_MATH_VERSION = 2
_VERSION_FILE = "model_math_version.txt"


def _warn_if_math_mismatch(ckpt_dir: str):
    import warnings

    vf = os.path.join(ckpt_dir, _VERSION_FILE)
    found = None
    if os.path.exists(vf):
        try:
            with open(vf) as f:
                found = int(f.read().strip())
        except ValueError:
            pass
    if found != MODEL_MATH_VERSION:
        warnings.warn(
            f"checkpoint at {ckpt_dir} was written with model-math version "
            f"{found} (current: {MODEL_MATH_VERSION}); param shapes match "
            "but outputs/metrics are not comparable across versions — see "
            "utils/checkpoint.py MODEL_MATH_VERSION history"
        )


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int, *, max_to_keep: int = 3):
    mgr = _manager(ckpt_dir, max_to_keep)
    payload = {
        "generator": state.g_params,
        "discriminator": state.d_params,
        "optimizer_g": state.g_opt_state,
        "optimizer_d": state.d_opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
    }
    mgr.save(int(state.step), args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()
    with open(os.path.join(ckpt_dir, _VERSION_FILE), "w") as f:
        f.write(f"{MODEL_MATH_VERSION}\n")


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, state: TrainState) -> tuple[TrainState, int]:
    """Restore into the shape/sharding skeleton of ``state``. Returns
    (state, start_epoch)."""
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return state, 0
    _warn_if_math_mismatch(ckpt_dir)
    skeleton = {
        "generator": state.g_params,
        "discriminator": state.d_params,
        "optimizer_g": state.g_opt_state,
        "optimizer_d": state.d_opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(0),
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(skeleton))
    mgr.close()
    new_state = TrainState(
        step=jax.numpy.asarray(restored["step"]),
        g_params=restored["generator"],
        d_params=restored["discriminator"],
        g_opt_state=restored["optimizer_g"],
        d_opt_state=restored["optimizer_d"],
    )
    return new_state, int(restored["epoch"]) + 1


def load_generator_params(path: str) -> Any:
    """Tolerant single-file loader mirroring inference.py:34-105: accepts
    an orbax dir, an .npz of flattened params, or a msgpack file; accepts
    both wrapped ({'generator': ...}) and bare param trees."""
    import flax.serialization
    import flax.traverse_util as tu

    if os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        tree = ckptr.restore(os.path.abspath(path))
        return tree.get("generator", tree)
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        tree = tu.unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
        return tree.get("generator", tree)
    with open(path, "rb") as f:
        tree = flax.serialization.msgpack_restore(f.read())
    return tree.get("generator", tree)


def save_generator_params(path: str, g_params: Any, *, wrapped: bool = True):
    """Save params as msgpack (.msgpack) or flattened .npz."""
    import flax.serialization
    import flax.traverse_util as tu

    tree = {"generator": g_params} if wrapped else g_params
    if path.endswith(".npz"):
        flat = tu.flatten_dict(jax.tree_util.tree_map(np.asarray, tree))
        np.savez(path, **{"/".join(map(str, k)): v for k, v in flat.items()})
    else:
        with open(path, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(
                jax.tree_util.tree_map(np.asarray, tree)
            ))


def infer_generator_config(g_params: Any):
    """Recover the GeneratorConfig architecture from a bare param tree.

    The reference's load_model (inference.py:34-105) hard-codes its one
    architecture; here the ladder is parameterized, so a serving handler
    pointed at a bare checkpoint (no generator_config.json next to it)
    must recover max_resolution / channel plan / expert count / router
    width from the param shapes or it will build the wrong graph.
    Everything shape-derivable is inferred; head count and dtypes keep
    their config defaults (head count does not change param shapes).
    """
    import flax.traverse_util as tu

    from moegan_tpu.config import GeneratorConfig

    flat = tu.flatten_dict(g_params, sep="/")
    keys = set(flat)

    blocks = sorted(
        {int(k.split("/")[0].rsplit("_", 1)[1])
         for k in keys if k.startswith("gen_block_")}
    )
    if not blocks:
        raise ValueError("param tree has no gen_block_* scopes")
    channels = {
        r: int(flat[f"gen_block_{r}/attn_block/norm1/scale"].shape[0])
        for r in blocks
    }
    rgb = sorted(
        {int(k.split("/")[0].rsplit("_", 1)[1])
         for k in keys if k.startswith("to_rgb_")}
    )
    offsets = sorted(
        r for r in blocks
        if f"gen_block_{r}/conv_block/mtm1/offset_conv1/kernel" in keys
    )
    w1 = flat[f"gen_block_{blocks[0]}/attn_block/moe/w1"]
    feature_mu = flat[f"gen_block_{blocks[0]}/attn_block/moe/router/feature_mu"]
    mapping_layers = len({k.split("/")[0] for k in keys if k.startswith("mapping_")})
    mapping_width = int(flat["mapping_0/kernel"].shape[1])
    text_dim = int(flat["text_proj_1/kernel"].shape[0])
    latent_dim = int(flat["mapping_0/kernel"].shape[0]) - int(
        flat["text_proj_2/kernel"].shape[1]
    )
    return GeneratorConfig(
        latent_dim=latent_dim,
        text_embedding_dim=text_dim,
        max_resolution=blocks[-1],
        channels=channels,
        num_experts=int(w1.shape[0]),
        router_hidden=int(feature_mu.shape[1]),
        offset_max_resolution=offsets[-1] if offsets else 0,
        rgb_min_resolution=rgb[0] if rgb else blocks[-1],
        mapping_layers=mapping_layers,
        mapping_width=mapping_width,
    )
