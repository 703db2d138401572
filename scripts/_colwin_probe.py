"""Probe: does Mosaic lower a dynamic, 128-aligned lane-dim (column) slice
of a VMEM block, feeding an MXU contraction?  This is the enabler for the
windowed x contraction (column windowing) in the slab kernels.

Also probes the sublane-dim dynamic slice combined with it (both-axis
window), and measures the matmul-cost sensitivity.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NR = NC = 256
R = 1024
WIN_R = 128
WIN_C = 128


def kernel(x_ref, haty_ref, hatx_ref, meta_ref, out_ref):
    r0 = pl.multiple_of(meta_ref[0, 0], 8)
    c0 = pl.multiple_of(meta_ref[0, 1], 128)
    sl = x_ref[0, pl.ds(r0, WIN_R), pl.ds(c0, WIN_C)]  # (WIN_R, WIN_C)
    hy = haty_ref[pl.ds(r0, WIN_R), :]  # (WIN_R, R)
    colvals = jax.lax.dot_general(
        sl, hy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (WIN_C, R)
    hx = hatx_ref[pl.ds(c0, WIN_C), :]  # (WIN_C, R)
    out_ref[:] = jnp.sum(colvals * hx, axis=0, keepdims=True)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, NR, NC), jnp.float32)
    haty = jax.random.uniform(key, (NR, R), jnp.float32)
    hatx = jax.random.uniform(key, (NC, R), jnp.float32)
    meta = jnp.array([[8 * 3, 128]], jnp.int32)

    f = jax.jit(
        lambda x, hy, hx, m: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
        )(x, hy, hx, m)
    )
    got = np.asarray(f(x, haty, hatx, meta))
    r0, c0 = 24, 128
    sl = np.asarray(x)[0, r0 : r0 + WIN_R, c0 : c0 + WIN_C]
    hy = np.asarray(haty)[r0 : r0 + WIN_R]
    hx = np.asarray(hatx)[c0 : c0 + WIN_C]
    want = (sl.T @ hy * hx).sum(axis=0, keepdims=True)
    err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
    print("col-window probe max rel err:", err)
    assert err < 1e-5, "MISMATCH"
    print("OK: dynamic 128-aligned lane slice lowers and is correct")


if __name__ == "__main__":
    main()
