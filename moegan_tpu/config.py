"""Typed configuration for the whole framework.

The reference scatters tunables over module constants, argparse, SageMaker
hyperparameter JSON, an HPO search-space JSON and SSM flags (see SURVEY.md
§5 "Config / flag system"; reference moegan/t2i_moe_gan.py:19-24 and
train_aurora_gan signature :1029-1046). Here everything lives in frozen
dataclasses that serialize to/from plain JSON dicts, so the same config can
be driven from a CLI, a JSON file, or the HPO harness.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

# Constants mirroring reference moegan/t2i_moe_gan.py:20-24.
LATENT_DIM = 512
TEXT_EMBEDDING_DIM = 512
NUM_EXPERTS = 4
CLIP_MODEL_TYPE = "ViT-B/32"


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _JsonMixin:
    def to_dict(self) -> dict:
        return _asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]):
        names = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in names:
                continue
            f = names[k]
            sub = f.type if isinstance(f.type, type) else None
            if dataclasses.is_dataclass(sub) and isinstance(v, Mapping):
                v = sub.from_dict(v)
            kwargs[k] = v
        return cls(**kwargs)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class GeneratorConfig(_JsonMixin):
    """Aurora generator architecture.

    The reference is hard-capped at 16x16 (t2i_moe_gan.py:673,679) with
    channel plan 4:512 -> 8:256 -> 16:128 (:704-706) and vestigial,
    never-built 32/64 blocks (:1019-1024). We parameterize the resolution
    ladder so 16 reproduces the reference and 64 is the flagship.
    """

    latent_dim: int = LATENT_DIM
    text_embedding_dim: int = TEXT_EMBEDDING_DIM
    max_resolution: int = 64
    # Output channels per resolution. Input channels for resolution r come
    # from the previous rung (or the 512-wide learned constant at 4x4).
    channels: Mapping[int, int] = field(
        default_factory=lambda: {4: 512, 8: 256, 16: 128, 32: 64, 64: 32}
    )
    num_experts: int = NUM_EXPERTS
    router_hidden: int = 128  # per-tower projection width (ref :279-293)
    attn_heads: int = 8  # ref AttentionBlock heads (:497)
    # Learned offset deformation only at low resolutions (ref :199).
    offset_max_resolution: int = 16
    # RGB taps at every resolution >= 8 (reference taps 8 and 16, :709-710).
    rgb_min_resolution: int = 8
    mapping_layers: int = 4  # ref :690-698
    mapping_width: int = 512
    # bf16 activations for MXU throughput; params stay fp32.
    compute_dtype: str = "bfloat16"
    # Rematerialize generative blocks (TPU analog of the reference's
    # torch.utils.checkpoint usage, :712-722,734-760). Off by default:
    # activations fit HBM comfortably at this model scale and remat costs
    # ~14% train throughput (bench sweep, round 1); enable when scaling
    # resolution/batch past HBM.
    remat_blocks: bool = False
    # Use Pallas kernels on TPU for the hot ops (falls back to XLA
    # elsewhere / when False).
    use_pallas: bool = True

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]):
        d = dict(d)
        if "channels" in d and isinstance(d["channels"], Mapping):
            d["channels"] = {int(k): int(v) for k, v in d["channels"].items()}
        return super().from_dict(d)

    def resolutions(self) -> Sequence[int]:
        res, r = [], 4
        while r <= self.max_resolution:
            res.append(r)
            r *= 2
        return tuple(res)

    def heads_for(self, dim: int) -> int:
        # At the reference's own block widths (dim >= 128, i.e. every block
        # its 16x16 regime instantiates) use its exact head count
        # (AttentionBlock heads=8, :497) so attention math is
        # reference-identical. The narrow 32/64-res blocks are OUR ladder
        # extension (the reference stubs them, :1019-1024); there 8 heads
        # would mean head_dim 4-8 — a ~5% MXU shape floor on every
        # attention matmul — so heads halve until head_dim >= 32
        # (param shapes are head-count independent: packed QKV is [D, D]).
        h = self.attn_heads
        if dim >= 128:
            return h
        while h > 1 and dim // h < 32:
            h //= 2
        return max(h, 1)


@dataclass(frozen=True)
class DiscriminatorConfig(_JsonMixin):
    """Text-conditional discriminator (ref t2i_moe_gan.py:858-907).

    At 16x16 the reference stack is 3->128->256 (16->8->4) with a 128-wide
    text projection tiled onto the 4x4 grid. For higher input resolutions
    we extend the downsampling ladder, doubling channels up to 256.
    """

    text_embedding_dim: int = TEXT_EMBEDDING_DIM
    max_resolution: int = 64
    base_channels: int = 32
    max_channels: int = 256
    text_features: int = 128
    compute_dtype: str = "bfloat16"

    def channel_plan(self) -> Sequence[int]:
        """Output channels for each stride-2 conv from max_resolution to 4."""
        import math

        n_down = int(math.log2(self.max_resolution // 4))
        if self.max_resolution == 16:
            return (128, 256)  # bit-parity with the reference plan
        ch, plan = self.base_channels, []
        for _ in range(n_down):
            ch = min(ch * 2, self.max_channels)
            plan.append(ch)
        return tuple(plan)


@dataclass(frozen=True)
class LossConfig(_JsonMixin):
    """Loss weights and schedules (train_aurora_gan defaults :1029-1046)."""

    # "nonsaturating" (reference) or "hinge" (BASELINE config 3 regime).
    gan_loss: str = "nonsaturating"
    r1_gamma: float = 10.0
    kl_weight: float = 1e-3
    kl_annealing_epochs: int = 5
    balance_weight: float = 0.01
    # Multi-level CLIP weights keyed by resolution; the reference uses
    # {16: 0.1, 8: 0.05} (:1033-1034). The 64-res flagship adds taps.
    clip_weights: Mapping[int, float] = field(
        default_factory=lambda: {64: 0.1, 32: 0.05, 16: 0.025, 8: 0.0125}
    )

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]):
        d = dict(d)
        if "clip_weights" in d and isinstance(d["clip_weights"], Mapping):
            d["clip_weights"] = {int(k): float(v) for k, v in d["clip_weights"].items()}
        return super().from_dict(d)
    # Reference computes CLIP image features under no_grad (:99-101), so
    # the CLIP loss is monitored but contributes no generator gradient.
    # True reproduces that; False lets gradients flow (the "fixed" mode).
    clip_stop_gradient: bool = True
    kl_clamp: float = 50.0  # per-step clamp, ref :1369-1370
    # The reference balances only the LAST block's routing (:951-1000),
    # which leaves expert collapse in earlier blocks unpenalized. True
    # applies the CV balance loss to every block's routing (mean over
    # blocks); False keeps reference parity.
    balance_all_blocks: bool = False
    # "cv": reference CV-of-soft-mass balance (:951-1000). "switch":
    # Switch-Transformer load loss E*sum(f_i*P_i) over hard dispatch
    # fractions — balances the argmax assignment distribution itself,
    # which the CV term can leave skewed while temperature annealing
    # keeps soft probs near-uniform (round-2 demo analysis).
    balance_kind: str = "cv"


@dataclass(frozen=True)
class MeshConfig(_JsonMixin):
    """Device mesh layout: data-parallel x expert-parallel over ICI."""

    data_axis: str = "data"
    expert_axis: str = "expert"
    # expert axis size; 1 = no expert sharding. Must divide num_experts.
    expert_parallelism: int = 1


@dataclass(frozen=True)
class TrainConfig(_JsonMixin):
    """Mirror of the train_aurora_gan signature (:1029-1046) plus TPU knobs."""

    num_epochs: int = 50
    batch_size: int = 64
    lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    weight_decay: float = 0.01  # ref :1100
    lr_warmup_epochs: int = 3
    lr_min_fraction: float = 0.05  # cosine floor, ref :1111
    grad_clip_g: float = 0.8  # ref :1417
    grad_clip_d: float = 0.7  # ref :1333
    gradient_accumulation_steps: int = 1
    truncation_psi: float = 1.0  # training never truncates (ref default path)
    log_interval: int = 10
    seed: int = 0
    steps_per_epoch: int | None = None  # derived from the dataset if None
    # False (default) regenerates the fake per phase with an independent
    # Bayesian weight sample, reproducing the reference exactly
    # (t2i_moe_gan.py:1292, :1358). True runs ONE generator forward per
    # step and feeds the D phase stop_gradient(fake) — ~20% faster, but a
    # 3-seed convergence A/B (scripts/shared_fake_ab.py,
    # runs/shared_fake_ab/ab_summary.json) measured consistently worse
    # generator convergence (last-5-epoch val_g_loss 3.51 vs 2.56, gap
    # 7x the reference arm's seed noise; val_d_loss identical), so the
    # speed mode is opt-in.
    shared_fake: bool = False
    loss: LossConfig = field(default_factory=LossConfig)
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]):
        d = dict(d)
        for key, sub in (
            ("loss", LossConfig),
            ("generator", GeneratorConfig),
            ("discriminator", DiscriminatorConfig),
            ("mesh", MeshConfig),
        ):
            if key in d and isinstance(d[key], Mapping):
                d[key] = sub.from_dict(d[key])
        return super().from_dict(d)


def tpu_flagship_config(batch_size: int = 64) -> TrainConfig:
    """Opt-in TPU-first flagship: the parity plan with every rung >= 64 wide.

    The reference's channel plan narrows to C=32 at res 64 (our ladder
    extension of t2i_moe_gan.py:704-706 keeps halving), so nearly every
    hot contraction at the two most expensive rungs has K or N = 32 and
    can fill at most 25% of the 128x128 MXU regardless of scheduling
    (fill-corrected floor analysis, scripts/shape_census.py and
    README "Where the floor actually is"). This preset doubles the width
    of every rung above 8 — min dim 64 = 50% MXU fill at res 64, full
    fill at res <= 16 — demonstrating that the framework, not the ported
    architecture, sets the throughput ceiling. NOT the parity config:
    ~4x the FLOPs at the top rung, different param shapes; use for MFU /
    scaling studies and greenfield training, never for reference
    comparisons.
    """
    return TrainConfig(
        batch_size=batch_size,
        generator=GeneratorConfig(
            max_resolution=64,
            channels={4: 512, 8: 512, 16: 256, 32: 128, 64: 64},
        ),
        discriminator=DiscriminatorConfig(max_resolution=64, base_channels=64),
    )


def coerce_hyperparameters(raw: Mapping[str, str]) -> dict:
    """String->typed coercion of a SageMaker-style hyperparameter dict.

    Mirrors reference moegan/sagemaker_train.py:85-102 where every value
    arrives as a string and is coerced by key.
    """
    out: dict[str, Any] = {}
    int_keys = {
        "epochs", "num_epochs", "batch_size", "kl_annealing_epochs",
        "lr_warmup_epochs", "gradient_accumulation_steps", "seed",
        "max_resolution", "log_interval",
    }
    float_keys = {
        "learning_rate", "lr", "beta1", "beta2", "r1_gamma", "kl_weight",
        "balance_weight", "clip_weight_64", "clip_weight_32",
        "clip_weight_16", "clip_weight_8", "truncation_psi",
    }
    for k, v in raw.items():
        if k in int_keys:
            out[k] = int(float(v))
        elif k in float_keys:
            out[k] = float(v)
        elif isinstance(v, str) and v.lower() in ("true", "false"):
            out[k] = v.lower() == "true"
        else:
            out[k] = v
    return out
