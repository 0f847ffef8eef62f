"""Offline converter proofs against REAL torch forwards.

The reference consumes pretrained CLIP ViT-B/32 via the openai-clip
package (/root/reference/moegan/t2i_moe_gan.py:32-119) and torchvision
InceptionV3 for FID (/root/reference/moegan/inference.py:161-208). This
environment has no network egress, so pretrained weights can't be
downloaded — but torch-CPU + transformers ARE installed, which lets us
prove the weight converters and tower architectures against genuine torch
forward passes on random-init models:

- a random-init ``transformers.CLIPModel(CLIPConfig())`` (ViT-B/32 dims)
  state_dict converted by scripts/convert_clip.py:convert_hf must make the
  JAX towers reproduce get_image_features / get_text_features;
- the vendored BPE (models/bpe.py) must produce CLIPTokenizer's ids on a
  synthesized vocab/merges pair;
- a hand-built torch InceptionV3 (torchvision module/state_dict layout,
  BasicConv2d conv+BN) converted by scripts/convert_inception.py:convert
  must make inception_jax.features reproduce the torch pool-2048 output.

Any transposition/epsilon/pooling drift in the converters or towers fails
these tests, so real weights can be dropped in with confidence.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo")  # scripts/ is not a package


@pytest.fixture(scope="module")
def hf_clip():
    """Random-init HF CLIPModel with ViT-B/32 geometry (no download)."""
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(0)
    model = CLIPModel(CLIPConfig())  # defaults == openai/clip-vit-base-patch32
    model.eval()
    return model


@pytest.fixture(scope="module")
def clip_jax_params(hf_clip):
    from scripts.convert_clip import convert_hf

    from moegan_tpu.models import clip_jax

    sd = {k: v.detach().numpy() for k, v in hf_clip.state_dict().items()}
    flat = convert_hf(sd)
    return clip_jax.params_from_flat(
        {k: np.asarray(v, np.float32) for k, v in flat.items()}
    )


def test_clip_image_tower_matches_hf_forward(hf_clip, clip_jax_params):
    from moegan_tpu.models import clip_jax

    torch.manual_seed(1)
    # pixel_values in CLIP-normalized space, as both towers expect.
    pix = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = hf_clip.get_image_features(pixel_values=pix).numpy()

    tower = clip_jax.CLIPImageTower(compute_dtype=jnp.float32)
    x = jnp.asarray(pix.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    got = np.asarray(tower.apply({"params": clip_jax_params["image"]}, x))

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_text_tower_matches_hf_forward(hf_clip, clip_jax_params):
    from moegan_tpu.models import clip_jax

    rng = np.random.default_rng(2)
    B, L = 3, 77
    eos = 49407
    ids = np.zeros((B, L), np.int64)
    for i, n in enumerate((5, 12, 20)):
        ids[i, 0] = 49406
        ids[i, 1:n] = rng.integers(1, 49000, n - 1)
        ids[i, n] = eos
        ids[i, n + 1 :] = eos  # HF pads with the eos token
    with torch.no_grad():
        want = hf_clip.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones_like(torch.from_numpy(ids)),
        ).numpy()

    tower = clip_jax.CLIPTextTower(compute_dtype=jnp.float32)
    got = np.asarray(
        tower.apply({"params": clip_jax_params["text"]}, jnp.asarray(ids, jnp.int32))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bpe_matches_hf_clip_tokenizer(tmp_path):
    """The vendored BPE and transformers' CLIPTokenizer must agree on a
    synthesized vocab/merges pair (HF vocab.json generated FROM the
    vendored tokenizer's OpenAI-scheme vocab construction)."""
    import json

    from transformers import CLIPTokenizer

    from moegan_tpu.models.bpe import CLIPBPETokenizer

    merges = [
        ("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"),
        ("i", "n"), ("in", "g</w>"), ("c", "a"), ("ca", "t</w>"),
        ("d", "o"), ("do", "g</w>"), ("s", "t"), ("r", "e"),
        ("o", "n</w>"), ("e", "r</w>"),
    ]
    ours = CLIPBPETokenizer(merges=merges)

    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(ours.encoder))
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n"
    )
    hf = CLIPTokenizer(str(vocab_file), str(merges_file))

    # NOTE: html-escaped text excluded — the vendored tokenizer double-
    # unescapes (&amp; -> &) like OpenAI clip.tokenize (what the reference
    # uses); HF CLIPTokenizer without ftfy installed does not.
    prompts = [
        "the cat and the dog",
        "a stunning red car ON the road!",
        "counting 1 2 3... testing, re-doing things",
        "the cat's toy & the dog's bone",
    ]
    for p in prompts:
        want = hf(p)["input_ids"]  # [bos] ids [eos]
        got = [ours.sot] + ours.encode(p) + [ours.eot]
        assert got == want, p


# ---------------------------------------------------------------------------
# Hand-built torch InceptionV3 (torchvision layout) for the FID converter
# ---------------------------------------------------------------------------


class _BasicConv2d(torch.nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = torch.nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.nn.functional.relu(self.bn(self.conv(x)))


class _InceptionA(torch.nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = _BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = _BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(
            torch.nn.functional.avg_pool2d(x, 3, stride=1, padding=1)
        )
        return torch.cat([b1, b5, b3, bp], 1)


class _InceptionB(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = torch.nn.functional.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class _InceptionC(torch.nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = _BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        bp = self.branch_pool(
            torch.nn.functional.avg_pool2d(x, 3, stride=1, padding=1)
        )
        return torch.cat([b1, b7, bd, bp], 1)


class _InceptionD(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = _BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        bp = torch.nn.functional.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class _InceptionE(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = _BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = _BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(
            torch.nn.functional.avg_pool2d(x, 3, stride=1, padding=1)
        )
        return torch.cat([b1, b3, bd, bp], 1)


class _TorchInceptionV3(torch.nn.Module):
    """torchvision inception_v3 feature path (fc=Identity), state_dict-
    compatible naming, transform_input applied as in the pretrained model."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _InceptionA(192, 32)
        self.Mixed_5c = _InceptionA(256, 64)
        self.Mixed_5d = _InceptionA(288, 64)
        self.Mixed_6a = _InceptionB(288)
        self.Mixed_6b = _InceptionC(768, 128)
        self.Mixed_6c = _InceptionC(768, 160)
        self.Mixed_6d = _InceptionC(768, 160)
        self.Mixed_6e = _InceptionC(768, 192)
        self.Mixed_7a = _InceptionD(768)
        self.Mixed_7b = _InceptionE(1280)
        self.Mixed_7c = _InceptionE(2048)

    def forward(self, x01):
        # torchvision transform_input remap ([0,1] -> imagenet space).
        ch0 = x01[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
        ch1 = x01[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
        ch2 = x01[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
        x = torch.cat([ch0, ch1, ch2], 1)
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = torch.nn.functional.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = torch.nn.functional.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        return torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)


def test_inception_converter_matches_torch_forward():
    """convert_inception.convert on a REAL torch InceptionV3 state_dict
    (hand-built, torchvision naming, random-init with non-trivial BN
    stats) must make the JAX tower reproduce the torch pool-2048 output."""
    from scripts.convert_inception import convert

    from moegan_tpu.models import inception_jax

    torch.manual_seed(0)
    model = _TorchInceptionV3()
    # Non-trivial BN running stats so folding bugs can't hide.
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    flat = convert(sd)
    params = {}
    for key, v in flat.items():
        name, kind = key.rsplit("/", 1)
        params.setdefault(name, {})[kind] = jnp.asarray(v)

    # [-1,1] input at native 299 resolution (no resize in either path).
    rng = np.random.default_rng(3)
    img_m11 = rng.uniform(-1.0, 1.0, (1, 299, 299, 3)).astype(np.float32)

    with torch.no_grad():
        x01 = torch.from_numpy(
            ((img_m11 + 1.0) * 0.5).transpose(0, 3, 1, 2).copy()
        ).clamp(0, 1)
        want = model(x01).numpy()

    got = np.asarray(
        inception_jax.features(
            params, jnp.asarray(img_m11),
            variant="torchvision", compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# REAL trained weights: the reference's checked-in Bayesian router
# (/root/reference/moe/moe_results/bayesian_moe_model.pth, 3.1 MB) is the
# one piece of genuinely trained reference state reachable offline. These
# tests load it through prototype/convert.py and prove parity against the
# reference's own torch module (moe/moe_model.py:126-446) used as a
# behavioral oracle on shared inputs.
# ---------------------------------------------------------------------------

_REF_PTH = "/root/reference/moe/moe_results/bayesian_moe_model.pth"


@pytest.fixture(scope="module")
def trained_router_jax():
    if not __import__("os").path.exists(_REF_PTH):
        pytest.skip("reference trained router checkpoint not available")
    from moegan_tpu.prototype.convert import load_reference_router

    return load_reference_router(_REF_PTH)


@pytest.fixture(scope="module")
def trained_router_torch():
    """The reference's own BayesianMoEGatingNetwork with the trained
    state dict loaded (oracle only — executed read-only, never copied)."""
    import importlib.util

    if not __import__("os").path.exists(_REF_PTH):
        pytest.skip("reference trained router checkpoint not available")
    spec = importlib.util.spec_from_file_location(
        "ref_moe_model", "/root/reference/moe/moe_model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sd = torch.load(_REF_PTH, map_location="cpu", weights_only=True)
    net = mod.BayesianMoEGatingNetwork(512, 256, 9)
    net.load_state_dict({k[len("gating_network."):]: v for k, v in sd.items()})
    net.eval()
    return net


def _trained_gating():
    from moegan_tpu.prototype.gating import BayesianMoEGatingNetwork

    return BayesianMoEGatingNetwork(hidden_dim=256, num_experts=9)


def test_trained_router_metadata_reconciles(trained_router_jax):
    """Checkpoint dims + the 9 named clusters (cluster_descriptions.txt)
    reconcile: 512-dim CLIP text input, 256 hidden, 9 experts."""
    _, meta = trained_router_jax
    assert meta["input_dim"] == 512
    assert meta["hidden_dim"] == 256
    assert meta["num_experts"] == 9
    assert len(meta["clusters"]) == 9
    assert all(c.startswith("Cluster") for c in meta["clusters"])


def test_trained_router_deterministic_forward_matches_torch(
    trained_router_jax, trained_router_torch
):
    """sample=False (posterior means) forward: logits + probs must match
    the torch oracle on the REAL trained weights (ref moe_model.py:347-412)."""
    variables, _ = trained_router_jax
    gating = _trained_gating()
    rng = np.random.RandomState(0)
    for x in (
        rng.randn(8, 512).astype(np.float32),
        # unit-norm rows: CLIP embeddings are normalized downstream
        (lambda a: a / np.linalg.norm(a, axis=1, keepdims=True))(
            rng.randn(8, 512).astype(np.float32)
        ),
    ):
        with torch.no_grad():
            probs_t, _, logits_t = trained_router_torch(
                torch.from_numpy(x), sample=False
            )
        probs_j, kl_j, logits_j = gating.apply(variables, x, sample=False)
        np.testing.assert_allclose(
            np.asarray(logits_j), logits_t.numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(probs_j), probs_t.numpy(), atol=1e-5, rtol=1e-4
        )
        assert float(kl_j) == 0.0  # eval path reports zero KL (ref :83-88)


def test_trained_router_hmc_and_predict_expert_agree_with_torch(
    trained_router_jax, trained_router_torch
):
    """HMC uncertainty + predict_expert behavior on REAL trained weights.

    Bit-parity across frameworks is impossible for a stochastic sampler
    (different RNG streams), so the chains are pinned near the input with
    a tiny step size and matched budgets: the posterior-weight noise then
    dominates and both chains must (a) rank the same top-1 expert, which
    also equals the deterministic argmax, (b) produce mean probs within a
    coarse tolerance, (c) produce same-scale uncertainty, and (d) select
    the same experts under the reference's 0.7-threshold-else-argmax rule
    (moe_model.py:414-446)."""
    import jax as _jax

    from moegan_tpu.prototype.gating import (
        hamiltonian_monte_carlo,
        predict_expert,
    )

    variables, _ = trained_router_jax
    gating = _trained_gating()
    rng = np.random.RandomState(0)
    x = rng.randn(8, 512).astype(np.float32)

    for i in (0, 3, 6):  # decisive rows: det max prob > 0.9
        row = x[i : i + 1]
        with torch.no_grad():
            _, _, det_logits = trained_router_torch(
                torch.from_numpy(row), sample=False
            )
        det_top = int(det_logits.numpy().argmax())

        torch.manual_seed(0)
        mp_t, unc_t = trained_router_torch.hamiltonian_monte_carlo(
            torch.from_numpy(row), num_samples=15, burn_in=10, step_size=1e-4
        )
        mp_j, unc_j, acc = hamiltonian_monte_carlo(
            gating, variables, row, _jax.random.PRNGKey(i),
            num_samples=15, burn_in=10, step_size=1e-4,
        )
        mt = mp_t.numpy()[0]
        mj = np.asarray(mp_j)[0]
        assert int(mt.argmax()) == int(mj.argmax()) == det_top
        np.testing.assert_allclose(mj, mt, atol=0.3)
        # same-scale uncertainty (both are std over 15 posterior draws)
        assert np.abs(np.asarray(unc_j)[0] - unc_t.numpy()[0]).max() < 0.35
        assert 0.0 < float(acc) <= 1.0

        # reference selection rule on both chains' means
        sel_t = [e for e in range(9) if mt[e] > 0.7] or [int(mt.argmax())]
        sel_j, _, _ = predict_expert(
            gating, variables, row, _jax.random.PRNGKey(i),
            num_samples=15, burn_in=10, step_size=1e-4,
        )
        # On pinned chains both selections must name the deterministic
        # winner (threshold-crossing or argmax fallback, same rule).
        assert sel_t == [det_top] or mt[sel_t[0]] > 0.7
        assert sel_j == sel_t or sel_j == [det_top]
