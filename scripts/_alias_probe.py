"""Probe: inverted-grid accumulation via input_output_aliases on axon TPU.

Grid (n_blocks, n_chunks) with the accumulator block revisited every
n_chunks iterations: reads MUST see the previous sweep's writes through the
aliased HBM buffer.  Also times slice DMA amortisation: the big slice input
is indexed by the OUTER grid axis only, so pallas should fetch it once per
sweep instead of once per iteration.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N_BLOCKS, N_CHUNKS, R = 32, 64, 1024
SB, NR, NC = 8, 256, 256


def kern(acc_in_ref, slab_ref, out_ref):
    j = pl.program_id(0)
    # acc += sum over the slab block's first row chunk (content irrelevant;
    # the point is the dependency acc_new = f(acc_old))
    s = jnp.sum(slab_ref[0, :1, :128])
    out_ref[0] = acc_in_ref[0] + jnp.float32(1.0) + s * 0.0


def run(invert: bool):
    vol = jnp.zeros((N_BLOCKS * SB, NR, NC), jnp.float32)
    acc0 = jnp.zeros((N_CHUNKS, 1, R), jnp.float32)
    if invert:
        grid = (N_BLOCKS, N_CHUNKS)
        acc_idx = lambda j, c: (c, 0, 0)
        slab_idx = lambda j, c: (j, 0, 0)
    else:
        grid = (N_CHUNKS, N_BLOCKS)
        acc_idx = lambda c, j: (c, 0, 0)
        slab_idx = lambda c, j: (j, 0, 0)
    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, R), acc_idx),
            pl.BlockSpec((SB, NR, NC), slab_idx),
        ],
        out_specs=pl.BlockSpec((1, 1, R), acc_idx),
        out_shape=jax.ShapeDtypeStruct((N_CHUNKS, 1, R), jnp.float32),
        input_output_aliases={0: 0},
    )
    g = jax.jit(lambda a, v: f(a, v))
    out = g(acc0, vol)
    got = np.asarray(out)
    want = float(N_BLOCKS)
    ok = np.allclose(got, want)
    print(f"invert={invert}: correct={ok} (got {got.ravel()[0]}, want {want})")

    def fence(o):
        return float(np.asarray(o).ravel()[0])

    def batch(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = g(acc0, vol)
        fence(o)
        return time.perf_counter() - t0

    fence(g(acc0, vol))
    t1 = batch(5)
    t2 = batch(25)
    print(f"invert={invert}: {((t2-t1)/20)*1e3:.2f} ms/frame")
    return ok


ok1 = run(invert=False)
ok2 = run(invert=True)
sys.exit(0 if (ok1 and ok2) else 1)
