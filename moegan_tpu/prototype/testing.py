"""Manual router evaluation harness (reference moe/moe_testing.py).

Feeds canned prompts through the gating network, prints per-expert
probabilities with HMC uncertainties, and saves a bar chart
(expert_probabilities.png) — run by hand, asserts nothing, exactly like
the reference (:211-247). The automated equivalents live in
tests/test_prototype.py.
"""

from __future__ import annotations

import numpy as np

CANNED_PROMPTS = [
    "a beautiful mountain landscape at sunset",
    "a portrait of a smiling woman",
    "a busy city street with tall buildings",
    "a dog playing in the park",
    "a plate of delicious pasta",
    "an abstract painting with vibrant colors",
    "a red sports car on the highway",
]


def run_harness(
    moe=None,
    prompts=CANNED_PROMPTS,
    output_png: str = "expert_probabilities.png",
    num_samples: int = 25,
    burn_in: int = 20,
    clip_params=None,
    seed: int = 0,
):
    """Evaluate the router on canned prompts; save a probability bar chart."""
    from moegan_tpu.models.clip_jax import encode_text, load_clip_params
    from moegan_tpu.prototype.moe_wrapper import MixtureOfExperts

    clip_params = clip_params or load_clip_params()
    if moe is None:
        moe = MixtureOfExperts(512, 128, 4, seed=seed,
                               num_samples=num_samples, burn_in=burn_in)

    results = []
    for prompt in prompts:
        emb = np.asarray(encode_text(clip_params, prompt), np.float32)
        _, selected, mean_probs, uncertainty = moe(emb)
        results.append(
            dict(prompt=prompt, probs=np.asarray(mean_probs)[0],
                 uncertainty=np.asarray(uncertainty)[0], selected=selected)
        )
        print(f"\n{prompt!r}")
        print(moe.describe_selection(emb))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(results)
        fig, axes = plt.subplots(n, 1, figsize=(8, 2.2 * n), squeeze=False)
        for ax, r in zip(axes[:, 0], results):
            x = np.arange(len(r["probs"]))
            ax.bar(x, r["probs"], yerr=r["uncertainty"], capsize=3)
            ax.set_title(r["prompt"], fontsize=8)
            ax.set_ylim(0, 1)
            ax.set_xticks(x)
        fig.tight_layout()
        fig.savefig(output_png, dpi=100)
        print(f"saved {output_png}")
    except Exception as e:  # chart is best-effort (headless etc.)
        print(f"skipping chart: {e}")
    return results


if __name__ == "__main__":
    run_harness()
