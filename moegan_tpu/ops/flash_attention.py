"""Fused flash attention (Pallas, TPU) — forward AND backward kernels.

Online-softmax attention that never materializes the [T, T] score matrix
in HBM — the TPU-native answer to the reference's nn.MultiheadAttention
over spatial tokens (t2i_moe_gan.py:545-555), which at the rebuilt 64x64
resolution would allocate B*H*4096^2 scores. The training step is
HBM-bandwidth-bound (XLA cost analysis, round 1), so the backward is also
fused: the standard flash-attention backward recomputes probabilities
from the saved per-row logsumexp and keeps every [blk, blk] tile in VMEM,
replacing the chunked-XLA recompute that wrote [blk, T] fp32 buffers.

Layout: q, k, v are [B, T, H, D]; heads fold into the grid so each
program streams one tile against the full K/V of its (batch, head) slice.

Backward math (non-causal):
  L_i   = logsumexp_j(s_ij)            (saved by the forward)
  p_ij  = exp(s_ij - L_i)
  D_i   = sum_d(do_id * o_id)          (precomputed per row)
  ds_ij = p_ij * (do_i . v_j - D_i)
  dq_i  = scale * sum_j ds_ij k_j
  dk_j  = scale * sum_i ds_ij q_i
  dv_j  = sum_i p_ij do_i
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moegan_tpu.ops.chunked_attention import chunked_attention

NEG_INF = -1e30
LOG2E = math.log2(math.e)

_EXP2_CACHE: dict = {}
_FUSED_L_CACHE: dict = {}
_NOMAX_CACHE: dict = {}
_DV_BF16_CACHE: dict = {}
_AUGSUB_CACHE: dict = {}
_PBF16_CACHE: dict = {}


def _dv_bf16_wanted() -> bool:
    """EXPERIMENT (opt-in): run the backward's dv matmul in the storage
    dtype instead of fp32. The kernel upcasts do to fp32 for the delta
    row-sum, and dv = p^T @ do inherited that fp32 operand — making it
    the ONE fp32 MXU dot in the whole fwd+bwd path (fp32 matmul is ~4x
    the MXU passes of bf16 on v5e at the same fill). The numerics delta
    is p alone: do's fp32 mantissas ARE its bf16 inputs (exact upcast),
    so quantizing do back is lossless; p however is currently fed at
    fp32 precision while the FORWARD's PV dot already quantizes the same
    p to bf16 — this flag makes the backward match the forward's
    precision instead of exceeding it.

    MEASURED: no b64 effect — 1035.3/1027.7/1035.0 imgs/s/chip vs
    interleaved controls 1033.0/1030.3 (runs/r5_tpu_log8.txt); the
    chain-6 1073.0 first reading was an outlier (single-run spread can
    reach +40 — see the chain-7 header note). Mosaic evidently already
    handles the fp32-operand dot without the feared 4x pass count at
    this 25% fill. SETTLED at b128 too: the chain-8 interleaved
    replication (median-of-3 bench) read 1042.87 with the flag vs
    1042.55/1042.21 controls (runs/r5_tpu_log9.txt) — the earlier
    1042.9-vs-1014 delta was single-sample bench noise (removed by
    bench.py --reps medianing), not this flag. No effect at either
    batch size. Default OFF.
    Enable with MOEGAN_FLASH_DV_BF16=1."""
    import os

    v = os.environ.get("MOEGAN_FLASH_DV_BF16", "0")
    if v not in _DV_BF16_CACHE:
        _DV_BF16_CACHE[v] = v == "1"
    return _DV_BF16_CACHE[v]


def _augsub_wanted() -> bool:
    """EXPERIMENT (opt-in): fold the backward's two broadcast subtracts
    into the MXU dots via augmented columns. p = exp(s - lse) and
    ds = p * (dp - delta) each pay a [block_q, block_k] VPU subtract per
    score tile; appending -lse as a 33rd column of q (against a ones
    column on k) and delta as a 33rd column of do (against a -ones
    column on v) computes s' = q.k - lse and dp' = do.v - delta inside
    the already-paid matmuls — K grows 32 -> 33, free at the C=32 25%
    MXU fill (K pads to 128 regardless). Cost: lse and delta are
    quantized to the storage dtype (bf16) instead of fp32 — the same
    order of rounding the bf16 q.k inputs already impose on s. The
    column concats are once per (program, kv-tile) on [*, D] operands —
    block_q/(D+1) times smaller than the subtracts they replace.
    MEASURED LOSER on hardware: 806 vs ~1025 imgs/s/chip at b64
    (runs/r5_tpu_log6.txt) — the per-tile concats force extra VMEM
    copies/relayouts that dwarf the two subtracts they remove. Kept as
    a documented rejected experiment; default OFF
    (MOEGAN_FLASH_AUGSUB=1 to reproduce the measurement)."""
    import os

    v = os.environ.get("MOEGAN_FLASH_AUGSUB", "0")
    if v not in _AUGSUB_CACHE:
        _AUGSUB_CACHE[v] = v == "1"
    return _AUGSUB_CACHE[v]


def _pbf16_wanted() -> bool:
    """EXPERIMENT (opt-in): compute softmax probabilities in bf16. The
    score tile is converted to bf16 right after the MXU drain (Mosaic
    REQUIRES a 32-bit matmul accumulator — a bf16 preferred_element_type
    fails kernel verification on hardware, runs/r5_tpu_log6.txt — so the
    convert is one VPU pass) and exp2 runs on bf16 vectors, which Mosaic
    can pack 2-per-lane; the p -> bf16 cast
    before the PV dot disappears because p is BORN bf16. The forward's p
    was already quantized to bf16 for the PV matmul, so the only new
    rounding is s itself (|s| <~ 30 in base-2 units -> absolute error
    <~ 0.06 -> p relative error <~ 4% worst-case, ~0.4% typical) — a
    numerics CHANGE, gated off by default; promote only with a hardware
    win AND a convergence check. Forward applies under NOMAX only (the
    online-max paths mix fp32 running maxima into the same vectors);
    the backward (which never computes a max) applies unconditionally.

    MEASURED: no edge beyond NOMAX alone — NOMAX+PBF16 1038.2 and
    NOMAX+DV_BF16+PBF16 1026.4 vs control 1030.3 and NOMAX-alone arms
    1031-1042 (runs/r5_tpu_log7.txt): the post-drain convert eats the
    packed-exp2 saving. Stays opt-in.
    Enable with MOEGAN_FLASH_PBF16=1."""
    import os

    v = os.environ.get("MOEGAN_FLASH_PBF16", "0")
    if v not in _PBF16_CACHE:
        _PBF16_CACHE[v] = v == "1"
    return _PBF16_CACHE[v]


def _nomax_wanted() -> bool:
    """EXPERIMENT (opt-in): drop the online row-max from the forward
    softmax. Softmax is shift-invariant, so p = exp2(s) (no max subtract)
    followed by the l-normalization is the same real-number function; in
    fp32 the shift by a power of two is exact, so the only behavioral
    change is the RANGE: p overflows to inf when a base-2 score exceeds
    ~128 (natural logit ~88 — far outside anything a trained attention
    produces, and the train step's non-finite guard skips such an update)
    and a row whose every score is below ~-126 underflows to l=0 (guarded
    by an l floor -> o=0 instead of NaN). What it buys: the row-max
    reduce AND the broadcast subtract disappear from every
    [block_q, block_k] score tile — 2 of the ~4 VPU passes in the
    VPU-bound res-64 forward (the backward never computes a max; it
    subtracts the saved lse, which this mode saves as plain log2(l)).

    MEASURED: +10 trend INSIDE the +-12 noise band across 4 interleaved
    pairings (1031.5/1041.8/1034.7/1038.2 vs controls
    1030.6/1015.4/1031.4/1030.3 — runs/r5_tpu_log5.txt, log7.txt).
    Stays opt-in: a numerics change (range semantics) may only become a
    default with a win clearly outside noise AND convergence evidence
    (PARITY.md §8 rule), and the win is not established. Enable with
    MOEGAN_FLASH_NOMAX=1."""
    import os

    v = os.environ.get("MOEGAN_FLASH_NOMAX", "0")
    if v not in _NOMAX_CACHE:
        _NOMAX_CACHE[v] = v == "1"
    return _NOMAX_CACHE[v]


def _fused_l_wanted() -> bool:
    """Fold the softmax denominator into the PV matmul: append a ones
    column to V inside the kernel so row i of p @ [v | 1] carries both
    the weighted values AND l_i = sum_j p_ij. The cross-lane VPU
    sum-reduce over every [block_q, block_k] score tile (a shuffle
    cascade on TPU, one of ~4 VPU passes in the VPU-bound res-64
    attention) becomes a free 33rd output lane of the already-paid MXU
    dot (which uses 32 of 128 output lanes at C=32). The denominator is
    then computed from the same bf16-quantized p the numerator uses —
    strictly more self-consistent than the fp32 side-sum. Default ON
    since the round-5 2x2 hardware A/B (runs/r5_tpu_log2.txt, b64
    flagship): fused_l=1 won both its cells — 1030.05 (exp2) / 1022.36
    (natural) vs 996.26 / 1023.48 with fused_l=0. Replicated by the
    chain-3 queue (runs/r5_tpu_log3.txt): 1024.55 / 1026.5 at full
    defaults, so the promoted build sits at 1025-1030 imgs/s/chip.
    Opt out with MOEGAN_FLASH_FUSED_L=0."""
    import os

    v = os.environ.get("MOEGAN_FLASH_FUSED_L", "1")
    if v not in _FUSED_L_CACHE:
        _FUSED_L_CACHE[v] = v != "0"
    return _FUSED_L_CACHE[v]


def _exp2_wanted() -> bool:
    """Base-2 softmax: fold log2(e) into the q pre-scale (free — it rides
    the same [T, D] multiply as 1/sqrt(D)) and use exp2/log2 throughout,
    saving the x*log2e VPU multiply inside every exp on every score
    element, fwd and bwd. The step is VPU-bound at the res-64 rung
    (README per-rung attribution: softmax work at C=32 is of the same
    order as the useful MACs), so transcendental shaving is on the
    critical path. Default ON since the round-4 hardware A/B: 1010.05
    imgs/s/chip (exp2) vs 995.20 (natural base) at the b64 flagship,
    back-to-back runs (runs/r4_tpu_log13.txt). Round-5 caveat: with the
    q pre-scale landed (which absorbed the multiply exp2 piggybacked
    on), the 2x2 A/B (runs/r5_tpu_log2.txt) shows exp2's edge only
    survives under fused_l=1 — 1030.05 vs 1022.36 there, but 996.26 vs
    1023.48 under fused_l=0 — so exp2 stays default-ON alongside the
    fused_l=1 default. Chain-3 replication under fused_l=1 (2 more
    runs per arm, runs/r5_tpu_log3.txt): exp2=1 1024.55/1026.5 vs
    exp2=0 1023.56/1026.82 — the edge is within the noise band but
    never negative across 3 pairings, and the math is identical, so
    the default stands on the round-4/chain-2 evidence. The saved lse residual is
    in base-2 units; the flag is resolved ONCE at the public
    flash_attention entry and threaded to both kernels as a static
    custom_vjp argument, so the pair can never disagree — not even in
    eager execution with the env var flipped mid-step. Opt out with
    MOEGAN_FLASH_EXP2=0."""
    import os

    v = os.environ.get("MOEGAN_FLASH_EXP2", "1")
    if v not in _EXP2_CACHE:
        _EXP2_CACHE[v] = v != "0"
    return _EXP2_CACHE[v]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref=None, *, block_k: int,
                compact_lse: bool = False, use_exp2: bool = False,
                fused_l: bool = False, no_max: bool = False,
                pbf16: bool = False):
    """One (batch*head, q-tile) program: online softmax over kv tiles.

    q arrives PRE-SCALED by 1/sqrt(D) (times log2e under use_exp2): the
    scale rides a [T, D] elementwise multiply outside the kernel instead
    of a [block_q, block_k] VPU pass over every score tile — T*T vs T*D
    elements, a 128x reduction at the res-64 shapes (T=4096, D=32).
    torch's MultiheadAttention pre-scales q the same way, so this is
    also the reference's numerics.

    q_ref: [block_q, D]; k_ref/v_ref: [T, D]; o_ref: [block_q, D];
    lse_ref: [block_q, 128] (logsumexp broadcast over lanes; col 0 used),
    or the whole [T//block_q, block_q] lane-packed block when compact_lse
    (128x less HBM for the residual; each q-tile program writes its own
    row). The sublane->lane relayout is done
    as an MXU matmul against an identity matrix (`_to_lanes`): both
    reshape-based formulations failed Mosaic's infer-vector-layout on
    hardware — per-tile [block_q//128, 128] blocks broke the (8,128)
    tiling rule (runs/r4_tpu_log1.txt item b) and whole-[T//128, 128]
    blocks hit `unsupported shape cast vector<1x2x128> -> vector<256x1>`
    (runs/r4_tpu_log2.txt) — while dot_general transposes lower
    natively. lse_ref=None marks the primal-only variant (inference /
    gradient-free forwards — e.g. the D-phase fresh fake — skip the
    4-byte-per-row lse write entirely, which at [BH, T, 128] fp32 tiling
    is a 134 MB HBM buffer at the 64x64 flagship shapes).
    """
    block_q, d = q_ref.shape
    t = k_ref.shape[0]
    n_kv = t // block_k

    # Keep Q/K/V in storage dtype (bf16 in training) for single-pass MXU
    # matmuls; accumulate fp32 via preferred_element_type.
    q = q_ref[:]
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)

    if fused_l:
        # Denominator rides the PV matmul: v gains a ones column, so
        # acc[:, d] accumulates l with the identical alpha rescale, and
        # the per-tile cross-lane sum-reduce disappears (see
        # _fused_l_wanted). The concat is a [block_k, d+1] VMEM copy per
        # tile — block_q/(d+1) times cheaper than the reduce it replaces.
        def body(i, carry):
            acc, m_prev = carry
            k_blk = k_ref[pl.ds(i * block_k, block_k), :]
            v_blk = v_ref[pl.ds(i * block_k, block_k), :]
            v_aug = jnp.concatenate(
                [v_blk, jnp.ones((block_k, 1), v_blk.dtype)], axis=1
            )

            s = jax.lax.dot_general(
                q, k_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                # Mosaic requires a 32-bit matmul accumulator (a bf16
                # preferred_element_type fails verification on hardware,
                # runs/r5_tpu_log6.txt); pbf16 converts AFTER the drain.
                preferred_element_type=jnp.float32,
            )  # [block_q, block_k]; scale already folded into q
            if pbf16:  # only reachable with no_max: exp2 runs packed bf16
                s = s.astype(jnp.bfloat16)
            if no_max:
                # Shift-free softmax (see _nomax_wanted): no row-max, no
                # subtract, no alpha rescale — plain accumulation.
                p = jnp.exp2(s) if use_exp2 else jnp.exp(s)
                acc = acc + jax.lax.dot_general(
                    p.astype(v_aug.dtype), v_aug,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc, m_prev
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            if use_exp2:
                alpha = jnp.exp2(m_prev - m_new)
                p = jnp.exp2(s - m_new)
            else:
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_aug.dtype), v_aug,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new

        acc0 = jnp.zeros((block_q, d + 1), jnp.float32)
        if no_max:
            m0 = jnp.zeros((block_q, 1), jnp.float32)
        acc, m = jax.lax.fori_loop(0, n_kv, body, (acc0, m0))
        l = acc[:, d:]
        if no_max:  # all-underflow row -> o = 0, never 0/0
            l = jnp.maximum(l, 1e-30)
        o_ref[:] = (acc[:, :d] / l).astype(o_ref.dtype)
    elif no_max:
        def body(i, carry):
            acc, l_prev = carry
            k_blk = k_ref[pl.ds(i * block_k, block_k), :]
            v_blk = v_ref[pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if pbf16:  # convert after the fp32 drain (Mosaic acc rule)
                s = s.astype(jnp.bfloat16)
            p = jnp.exp2(s) if use_exp2 else jnp.exp(s)
            l_new = l_prev + jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, l_new

        acc0 = jnp.zeros((block_q, d), jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc, l = jax.lax.fori_loop(0, n_kv, body, (acc0, l0))
        m = jnp.zeros((block_q, 1), jnp.float32)
        l = jnp.maximum(l, 1e-30)
        o_ref[:] = (acc / l).astype(o_ref.dtype)
    else:
        def body(i, carry):
            acc, m_prev, l_prev = carry
            k_blk = k_ref[pl.ds(i * block_k, block_k), :]
            v_blk = v_ref[pl.ds(i * block_k, block_k), :]

            s = jax.lax.dot_general(
                q, k_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [block_q, block_k] fp32; scale already folded into q

            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            if use_exp2:  # s already carries the log2e factor (see caller)
                alpha = jnp.exp2(m_prev - m_new)
                p = jnp.exp2(s - m_new)
            else:
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)

            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l_new

        acc0 = jnp.zeros((block_q, d), jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
        o_ref[:] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        # Base-2 lse when use_exp2 (the backward recomputes p in the
        # same base, so the saved units just have to match the pair).
        lse = m + (jnp.log2(l) if use_exp2 else jnp.log(l))  # [block_q, 1]
        if compact_lse:
            # Whole [T//block_q, block_q] block per bh; this program owns
            # row i (dynamic SUBLANE slice — supported, unlike the lane
            # casts both failed formulations needed).
            lse_ref[pl.ds(pl.program_id(1), 1), :] = _to_lanes(lse)
        else:
            lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


def _identity(n: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (rows == cols).astype(jnp.float32)


def _to_lanes(col):
    """[N, 1] -> [1, N] via an exact fp32 identity matmul (x*1 summed
    with zeros). Mosaic rejects this relayout as a reshape/shape-cast but
    lowers dot_general transposes natively; the matmul is one
    [N,1]x[N,N] op per program — noise next to the attention math."""
    n = col.shape[0]
    return jax.lax.dot_general(
        col, _identity(n),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _to_sublanes(row):
    """[1, N] -> [N, 1]: inverse of `_to_lanes`, same mechanism."""
    n = row.shape[1]
    return jax.lax.dot_general(
        _identity(n), row,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _compact_lse_wanted(block_q: int) -> bool:
    """Compact [BH, T//block_q, block_q] lse storage (vs lane-broadcast
    [BH, T, 128]): 128x less residual HBM, at the cost of an identity
    matmul per kernel program to relayout sublanes<->lanes (the only
    formulation of that relayout Mosaic lowers — see _fwd_kernel).
    Default ON since the round-4 hardware A/B: 988.74 imgs/s/chip with
    compact vs 984.29 lane-broadcast at the b64 flagship (runs/
    r4_tpu_log4.txt item a vs r4_tpu_log2.txt item a) — not slower, and
    134 MB less residual HBM at the 64x64 shapes. Opt out with
    MOEGAN_FLASH_COMPACT_LSE=0."""
    import os

    return (
        os.environ.get("MOEGAN_FLASH_COMPACT_LSE", "1") != "0"
        and block_q % 128 == 0
    )


def _flash_forward(q, k, v, *, block_q: int, block_k: int,
                   with_lse: bool = False, use_exp2: bool = False):
    """with_lse=True additionally returns the logsumexp in the layout the
    backward consumes AS-IS (no slice/re-broadcast round-trip through
    HBM): [BH, T, 128] lane-broadcast, or [BH, T//block_q, block_q]
    compact (lane-packed per q-tile)."""
    B, T, H, D = q.shape
    # 1/sqrt(D) (and log2e under exp2) folds into q OUTSIDE the kernel:
    # a [T, D] multiply (XLA fuses it into the fold transpose) instead of
    # a [block_q, block_k] VPU pass per score tile inside.
    sm_scale = (LOG2E if use_exp2 else 1.0) / math.sqrt(D)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, T, D)

    qf, kf, vf = (fold(q) * jnp.asarray(sm_scale, q.dtype)), fold(k), fold(v)

    grid = (B * H, T // block_q)
    in_specs = [
        pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * B * H * T * T * D,
        bytes_accessed=(4 * B * H * T * D) * 2,
        transcendentals=B * H * T * T,
    )
    fused_l = _fused_l_wanted()
    no_max = _nomax_wanted()
    pbf16 = _pbf16_wanted() and no_max  # fwd pbf16 requires the shift-free path
    if not with_lse:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, block_k=block_k, use_exp2=use_exp2,
                              fused_l=fused_l, no_max=no_max, pbf16=pbf16),
            grid=grid,
            in_specs=in_specs,
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            cost_estimate=cost,
        )(qf, kf, vf)
        return out.reshape(B, H, T, D).transpose(0, 2, 1, 3)

    compact = _compact_lse_wanted(block_q)
    if compact:
        # Whole [T//block_q, block_q] lane-packed block per bh (block
        # dims equal the array dims, satisfying the (8,128) tiling rule
        # for any tile count); each q-tile program writes its own row.
        lse_spec = pl.BlockSpec(
            (None, T // block_q, block_q), lambda b, i: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        lse_shape = jax.ShapeDtypeStruct((B * H, T // block_q, block_q), jnp.float32)
    else:
        lse_spec = pl.BlockSpec(
            (None, block_q, 128), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
        lse_shape = jax.ShapeDtypeStruct((B * H, T, 128), jnp.float32)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, block_k=block_k,
            compact_lse=compact, use_exp2=use_exp2, fused_l=fused_l,
            no_max=no_max, pbf16=pbf16,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[o_spec, lse_spec],
        out_shape=[jax.ShapeDtypeStruct((B * H, T, D), q.dtype), lse_shape],
        cost_estimate=cost,
    )(qf, kf, vf)
    out = out.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                      dq_ref, dk_ref, dv_ref, *, block_k: int,
                      dq_scale: float, dk_scale: float,
                      compact_lse: bool = False, use_exp2: bool = False,
                      dv_bf16: bool = False, augsub: bool = False,
                      pbf16: bool = False):
    """ONE backward kernel per (bh, q-tile): a single s/p recompute feeds
    dq AND the dk/dv accumulation (the two-kernel split recomputed s/p
    twice and fetched q/k/v/do twice — the same inefficiency the MoE
    backward had in round 1). dk/dv outputs are whole-[T,D] fp32 blocks
    indexed by bh only, so they stay VMEM-resident across the inner
    q-tile loop: zeroed at i==0, accumulated via sublane slices, cast
    outside. lse arrives as the forward's lane-broadcast output
    (col 0 used) and delta_i = sum_d(do*o) is computed HERE from the o
    tile — materializing it in XLA cost a [BH, T, 128] fp32 HBM
    round-trip per attention."""
    block_q, d = q_ref.shape
    t = k_ref.shape[0]
    n_kv = t // block_k
    i = pl.program_id(1)
    # q arrives PRE-SCALED by 1/sqrt(D)*(log2e under exp2) — see
    # _fwd_kernel — so the score recompute is a bare matmul and the saved
    # lse (base-2 under exp2) matches. ds = p*(dp-delta) is
    # d(loss)/d(s_natural): p = exp2(s2 - lse2) is numerically the same p
    # either way. The chain rule back to RAW q/k then needs
    #   dq_raw = dq_scale * sum_j ds k_j          (dq_scale = 1/sqrt(D))
    #   dk_raw = dk_scale * sum_i ds q_pre_i      (dk_scale = 1/sqrt(D)/pre
    #            = ln2 under exp2, 1.0 otherwise — the pre-scale already
    #            carries 1/sqrt(D), so the non-exp2 path drops the
    #            per-iteration [block_k, D] multiply entirely).

    q = q_ref[:]
    do_lp = do_ref[:]  # storage dtype (bf16 in training)
    do = do_lp.astype(jnp.float32)
    if compact_lse:
        # Row i of the whole lane-packed block -> [block_q, 1] column.
        lse = _to_sublanes(lse_ref[pl.ds(i, 1), :])
    else:
        lse = lse_ref[:, :1]
    delta = jnp.sum(do * o_ref[:].astype(jnp.float32), axis=-1, keepdims=True)

    if augsub:
        # -lse rides q as a 33rd column (against ones on k) and delta
        # rides do (against -ones on v): the two [block_q, block_k]
        # broadcast subtracts move into the matmuls' padded K lanes
        # (see _augsub_wanted; lse/delta are quantized to storage dtype).
        q_aug = jnp.concatenate([q, (-lse).astype(q.dtype)], axis=1)
        do_aug = jnp.concatenate([do_lp, delta.astype(do_lp.dtype)], axis=1)
    # dv operand precision (see _dv_bf16_wanted): bf16 restores the full
    # MXU rate and matches the forward PV dot's own p quantization.
    dv_rhs = do_lp if dv_bf16 else do

    @pl.when(i == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    def body(j, dq_acc):
        k_blk = k_ref[pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[pl.ds(j * block_k, block_k), :]

        if augsub:
            k_aug = jnp.concatenate(
                [k_blk, jnp.ones((block_k, 1), k_blk.dtype)], axis=1
            )
            v_aug = jnp.concatenate(
                [v_blk, -jnp.ones((block_k, 1), v_blk.dtype)], axis=1
            )
            sm = jax.lax.dot_general(
                q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,  # Mosaic acc rule
            )  # = q.k - lse, scale pre-folded into q
            if pbf16:
                sm = sm.astype(jnp.bfloat16)
            p = jnp.exp2(sm) if use_exp2 else jnp.exp(sm)
            dp = jax.lax.dot_general(
                do_aug.astype(v_blk.dtype), v_aug,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # = do.v - delta
            ds = p * dp
        else:
            s = jax.lax.dot_general(
                q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # scale pre-folded into q
            sm = s - lse
            if pbf16:
                sm = sm.astype(jnp.bfloat16)
            p = jnp.exp2(sm) if use_exp2 else jnp.exp(sm)
            dp = jax.lax.dot_general(
                do.astype(v_blk.dtype), v_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta)

        dv_ref[pl.ds(j * block_k, block_k), :] += jax.lax.dot_general(
            p.astype(dv_rhs.dtype), dv_rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dk_blk = jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dk_scale != 1.0:
            dk_blk = dk_blk * dk_scale
        dk_ref[pl.ds(j * block_k, block_k), :] += dk_blk.astype(dk_ref.dtype)

        return dq_acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, n_kv, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[:] = (dq * dq_scale).astype(dq_ref.dtype)


_FLASH_BWD_VMEM_CACHE: dict = {}


def _bwd_compiler_params():
    """Mosaic scoped-VMEM limit for the flash backward
    (MOEGAN_FLASH_BWD_VMEM_MB override; same pattern as the MoE
    backward's budget). Default 24 MB since the round-4 hardware A/B:
    it admits the block_k=4096 single-KV-iteration backward (true
    demand 18.58 MB > the 16 MB default heuristic) which benched
    1008.23 imgs/s/chip vs 998.26 at block_k=2048
    (runs/r4_tpu_log10.txt item b vs log6 item b). Unlike the MoE
    case, flash block shapes don't scale with batch (T is spatial), so
    the demand is batch-independent. block_q=512 stays rejected: its
    demand expands with the limit (16.79 @ 16 MB -> 20.30 @ 20 MB) and
    never fits."""
    import os
    import warnings

    mb = os.environ.get("MOEGAN_FLASH_BWD_VMEM_MB")
    if mb not in _FLASH_BWD_VMEM_CACHE:
        budget = 24 * 1024 * 1024
        if mb:
            try:
                budget = int(float(mb) * 1024 * 1024)
            except ValueError:
                warnings.warn(
                    f"MOEGAN_FLASH_BWD_VMEM_MB={mb!r} is not a number; "
                    "using the default 24 MB"
                )
        _FLASH_BWD_VMEM_CACHE[mb] = pltpu.CompilerParams(
            vmem_limit_bytes=budget
        )
    return _FLASH_BWD_VMEM_CACHE[mb]


def _flash_backward(q, k, v, o, lse, g, *, block_q: int, block_k: int,
                    use_exp2: bool = False):
    B, T, H, D = q.shape
    sm_scale = 1.0 / math.sqrt(D)
    # Same q pre-scale as the forward so the score recompute matches the
    # saved lse; the chain rule back to raw q/k is handled by
    # dq_scale/dk_scale inside the kernel (see _bwd_fused_kernel).
    pre = (LOG2E if use_exp2 else 1.0) * sm_scale

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, T, D)

    qf, kf, vf, of, gf = fold(q), fold(k), fold(v), fold(o), fold(g)
    qf = qf * jnp.asarray(pre, q.dtype)

    # lse layout is whatever the forward saved: [BH, T, 128]
    # lane-broadcast or [BH, T//block_q, block_q] compact (shape-detected
    # so the pair can never disagree).
    compact = lse.shape[1] != T
    if compact:
        lse_spec = pl.BlockSpec(
            (None, T // block_q, block_q), lambda b, i: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        lse_spec = pl.BlockSpec(
            (None, block_q, 128), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )

    dq, dkf, dvf = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, block_k=block_k, dq_scale=sm_scale,
            dk_scale=(math.log(2.0) if use_exp2 else 1.0),
            compact_lse=compact, use_exp2=use_exp2,
            dv_bf16=_dv_bf16_wanted(), augsub=_augsub_wanted(),
            pbf16=_pbf16_wanted(),
        ),
        grid=(B * H, T // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            lse_spec,
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, T, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * H * T * T * D,
            bytes_accessed=2 * 4 * B * H * T * D + 8 * B * H * T * D,
            transcendentals=B * H * T * T,
        ),
        compiler_params=_bwd_compiler_params(),
    )(qf, kf, vf, gf, of, lse)
    dk = dkf.astype(q.dtype)
    dv = dvf.astype(q.dtype)

    def unfold(x):
        return x.reshape(B, H, T, D).transpose(0, 2, 1, 3)

    return unfold(dq), unfold(dk), unfold(dv)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


def flash_attention(q, k, v, block_q: int = 256, block_k: int = 512):
    """Fused attention: [B, T, H, D] x3 -> [B, T, H, D].

    Falls back to the chunked XLA path when shapes don't tile or when not
    running on TPU (e.g. CPU tests).

    The primal (what runs in inference and in gradient-free forwards like
    the D-phase fresh fake) uses the no-lse kernel variant; only the VJP
    forward rule pays the lse write. The base-2-softmax flag is resolved
    HERE, once per call, and bound as a static custom_vjp argument so the
    forward's saved lse and the backward's exp can never disagree on the
    base — even in eager execution with MOEGAN_FLASH_EXP2 flipped between
    the forward and the backward of one step."""
    return _flash_attention(q, k, v, block_q, block_k, _exp2_wanted())


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, block_q: int, block_k: int, use_exp2: bool):
    block_q = min(block_q, q.shape[1])
    block_k = min(block_k, k.shape[1])
    if not _supported(q, block_q, block_k):
        return chunked_attention(q, k, v)
    return _flash_forward(q, k, v, block_q=block_q, block_k=block_k,
                          with_lse=False, use_exp2=use_exp2)


def _supported(q, block_q, block_k) -> bool:
    B, T, H, D = q.shape
    if jax.default_backend() != "tpu":
        return False
    return T % block_q == 0 and T % block_k == 0 and D % 8 == 0 and D <= 256


def _flash_fwd_rule(q, k, v, block_q, block_k, use_exp2):
    """VJP forward: also emits the lse in the layout the fused backward
    consumes directly (lse=None marks the fallback path)."""
    block_q = min(block_q, q.shape[1])
    block_k = min(block_k, k.shape[1])
    if not _supported(q, block_q, block_k):
        return chunked_attention(q, k, v), (q, k, v, None, None)
    out, lse = _flash_forward(q, k, v, block_q=block_q, block_k=block_k,
                              with_lse=True, use_exp2=use_exp2)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(block_q, block_k, use_exp2, res, g):
    q, k, v, o, lse = res
    if lse is None:  # fallback path: recompute via chunked XLA
        _, vjp = jax.vjp(lambda q_, k_, v_: chunked_attention(q_, k_, v_), q, k, v)
        return vjp(g)
    return _flash_backward(
        q, k, v, o, lse, g,
        block_q=min(block_q, q.shape[1]), block_k=min(block_k, k.shape[1]),
        use_exp2=use_exp2,
    )


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)

# Backwards-compat alias used by older tests.
_flash_fwd_kernel = None  # replaced by _fwd_kernel (new signature with lse)
