"""Compile-only Mosaic probe for the compact-lse flash attention layout.

Lowers + compiles (AOT, no chip execution) the flash fwd+bwd with
MOEGAN_FLASH_COMPACT_LSE=1 at the two shapes that killed the previous
formulations on hardware (runs/r4_tpu_log1.txt item b,
runs/r4_tpu_log2.txt item a): res-32 (T=1024) and res-64 (T=4096)
attention, block_q=256. Exits 0 iff every shape compiles.

Usage: python scripts/probe_compact_lse.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MOEGAN_FLASH_COMPACT_LSE", "1")

import jax
import jax.numpy as jnp

from moegan_tpu.ops.flash_attention import flash_attention


def main() -> int:
    ok = True
    for B, T, H, D in [(64, 1024, 8, 16), (64, 4096, 4, 8), (2, 256, 2, 16)]:
        shape = (B, T, H, D)
        q = jax.ShapeDtypeStruct(shape, jnp.bfloat16)

        def loss(q_, k_, v_):
            return jnp.sum(flash_attention(q_, k_, v_) ** 2)

        try:
            jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(q, q, q).compile()
            print(f"OK   {shape}")
        except Exception as e:  # noqa: BLE001 - report and continue probing
            ok = False
            print(f"FAIL {shape}: {type(e).__name__}: {str(e)[:2000]}")
    print("PROBE", "PASSED" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
