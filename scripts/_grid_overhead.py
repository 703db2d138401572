"""Microbench: pure Mosaic grid-iteration overhead at the forward kernel's
grid shape — itemizes the empty-frame floor (BASELINE.md roofline).

Variants, all at the production grid (n_blocks=32, n_chunks=64):
  empty       : kernel body does nothing (pure grid + block bookkeeping)
  smem        : + a (1, K) SMEM meta read of ~20 scalars + scalar branch
  resident    : + resident feats read (1 row) + can_contribute reduce +
                resident out init/accumulate gate — the full floor scaffold
                minus slice streaming
  slices      : empty body but streaming the (sb, 256, 256) volume slice
                blocks like the real kernel (slab-outer, fetched once/j)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volym_tpu.bench.harness import marginal_time

NB, NC, SB, NR = 32, 64, 8, 256
R = 1024
K = 20


def run(name, kernel, in_specs, inputs, out_specs, out_shape):
    f = jax.jit(
        lambda *a: pl.pallas_call(
            kernel, grid=(NB, NC), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
        )(*a)
    )
    args = [jnp.asarray(x) for x in inputs]
    ms = marginal_time(lambda: f(*args)) * 1e3
    per = ms * 1e3 / (NB * NC)
    print(f"{name:10s}: {ms:6.3f} ms  ({per:.2f} us/iter)", flush=True)


out_spec = pl.BlockSpec((NC, 4, R), lambda j, c: (0, 0, 0))
out_shape = jax.ShapeDtypeStruct((NC, 4, R), jnp.float32)


def k_empty(out_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])


run("empty", k_empty, [], [], out_spec, out_shape)


def k_smem(meta_ref, out_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    flags = [meta_ref[0, 0, 0, 1 + i] > 0 for i in range(SB)]
    occ = meta_ref[0, 0, 0, 0] > 0

    @pl.when(occ)
    def _steps():
        acc = out_ref[0]
        for fl in flags:
            @pl.when(fl)
            def _s(fl=fl):
                out_ref[0] = acc + 1.0


meta = np.zeros((NC, NB, 1, K), np.int32)
run(
    "smem", k_smem,
    [pl.BlockSpec((1, 1, 1, K), lambda j, c: (c, j, 0, 0), memory_space=pltpu.SMEM)],
    [meta], out_spec, out_shape,
)


def k_resident(feat_ref, meta_ref, out_ref):
    C = pl.program_id(1)
    fr = feat_ref.at[pl.ds(C, 1)]
    orf = out_ref.at[pl.ds(C, 1)]

    @pl.when(pl.program_id(0) == 0)
    def _():
        orf[0] = jnp.zeros_like(orf[0])

    feat0 = fr[0]
    can = (orf[0][3:4, :] < 0.95) & (feat0[0:1, :] < feat0[1:2, :])
    occ = meta_ref[0, 0, 0, 0] > 0

    @pl.when(jnp.any(can) & occ)
    def _steps():
        orf[0] = orf[0] + 1.0


feats = np.zeros((NC, 16, R), np.float32)
run(
    "resident", k_resident,
    [
        pl.BlockSpec((NC, 16, R), lambda j, c: (0, 0, 0)),
        pl.BlockSpec((1, 1, 1, K), lambda j, c: (c, j, 0, 0), memory_space=pltpu.SMEM),
    ],
    [feats, meta], out_spec, out_shape,
)


def k_slices(slice_ref, out_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])


vol = np.zeros((NB * SB, NR, NR), np.float32)
run(
    "slices", k_slices,
    [pl.BlockSpec((SB, NR, NR), lambda j, c: (j, 0, 0))],
    [vol], out_spec, out_shape,
)
