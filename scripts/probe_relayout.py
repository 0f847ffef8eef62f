#!/usr/bin/env python
"""Probe: does Mosaic support the sublane->lane relayout needed to store
flash-attention's per-row logsumexp COMPACTLY ([BH, T//128, 128] instead
of the current [BH, T, 128] lane-broadcast, which wastes 127/128 of the
bytes because TPU HBM tiling pads the minor dim to 128 lanes)?

Two tiny kernels: WRITE reshapes a [BQ, 1] column of row-reductions to
[BQ//128, 128]; READ reshapes it back and consumes it per-row. If both
compile and match numpy, the lse compaction in ops/flash_attention.py is
implementable (expected saving ~0.5 GB/step at the b64 flagship).

Run on the real TPU: python scripts/probe_relayout.py
(First attempt 2026-08-17 was inconclusive — the axon tunnel went down
mid-probe.)
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256


def wkern(x_ref, o_ref):
    col = jnp.sum(x_ref[:].astype(jnp.float32), axis=-1, keepdims=True)
    o_ref[:] = col.reshape(BQ // 128, 128)


def rkern(c_ref, x_ref, o_ref):
    col = c_ref[:].reshape(BQ, 1)
    o_ref[:] = x_ref[:] + col.astype(x_ref.dtype)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (BQ, 32), jnp.float32)
    c = pl.pallas_call(
        wkern,
        in_specs=[pl.BlockSpec((BQ, 32), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BQ // 128, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BQ // 128, 128), jnp.float32),
    )(x)
    want = np.asarray(x).sum(-1).reshape(BQ // 128, 128)
    print("WRITE max err", np.abs(np.asarray(c) - want).max())
    y = pl.pallas_call(
        rkern,
        in_specs=[
            pl.BlockSpec((BQ // 128, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, 32), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, 32), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BQ, 32), jnp.float32),
    )(c, x)
    want2 = np.asarray(x) + np.asarray(x).sum(-1, keepdims=True)
    print("READ max err", np.abs(np.asarray(y) - want2).max())
    print("PROBE: RELAYOUT SUPPORTED")


if __name__ == "__main__":
    main()
