from moegan_tpu.infer.sample import sample_aurora_gan, Sampler
from moegan_tpu.infer.fid import (
    frechet_distance,
    gaussian_stats,
    FIDEvaluator,
    clip_feature_extractor,
    inception_feature_extractor,
)

__all__ = [
    "sample_aurora_gan",
    "Sampler",
    "frechet_distance",
    "gaussian_stats",
    "FIDEvaluator",
    "clip_feature_extractor",
    "inception_feature_extractor",
]
