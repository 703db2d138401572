"""Eager-mode emulator for the slab Pallas kernels (CI without a TPU).

``pl.pallas_call(interpret=True)`` takes minutes even on an 8^3 volume (the
grid-loop emulation compiles pathologically), so CI runs the *actual kernel
functions* under this ~100-line shim instead: the grid is iterated in
Python, BlockSpecs are applied as numpy-style slices, and refs are mutable
wrappers over eager jnp arrays.  This exercises every line of the kernel
bodies (masking, windowing, accumulation, revisited-block semantics) —
everything except Mosaic lowering, which ``scripts/validate_slab_tpu.py``
covers on hardware.

Usage (see tests/test_slab_kernel_ci.py):

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(params, sign, vol, lut, feats)
"""

from __future__ import annotations

import contextlib
import itertools
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as real_pl
from jax.experimental.pallas import tpu as real_pltpu


class _DS:
    def __init__(self, start, size):
        self.start, self.size = start, size


class FakeRef:
    """Mutable ref over an eager jnp array supporting the kernels' indexing
    (ints, slices, ``pl.ds`` dynamic windows)."""

    def __init__(self, arr):
        self.arr = jnp.asarray(arr)

    @property
    def shape(self):
        return self.arr.shape

    @property
    def dtype(self):
        return self.arr.dtype

    def __jax_array__(self):
        # lets ``jnp.zeros_like(ref)`` etc. work like on a real pallas ref
        return self.arr

    def _key(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        out = []
        for i in idx:
            if isinstance(i, _DS):
                s = int(i.start)
                out.append(slice(s, s + i.size))
            elif isinstance(i, slice) or i is Ellipsis:
                out.append(i)
            else:
                out.append(int(i))
        return tuple(out)

    def __getitem__(self, idx):
        return self.arr[self._key(idx)]

    def __setitem__(self, idx, val):
        self.arr = self.arr.at[self._key(idx)].set(val)

    @property
    def at(self):
        # ref.at[idx] -> sub-ref view (pallas ref transform), as used by
        # the kernels' per-chunk indexing of whole-array resident blocks
        return _AtHelper(self)


class _AtHelper:
    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        return _SubRef(self._ref, self._ref._key(idx))


class _SubRef:
    """Writable view into a FakeRef through a fixed key (``ref.at[...]``)."""

    def __init__(self, parent, pkey):
        self.parent, self.pkey = parent, pkey

    @property
    def arr(self):
        return self.parent.arr[self.pkey]

    @property
    def shape(self):
        return self.arr.shape

    @property
    def dtype(self):
        return self.arr.dtype

    def __jax_array__(self):
        return self.arr

    def _key(self, idx):
        return FakeRef._key(self, idx)

    def __getitem__(self, idx):
        return self.arr[self._key(idx)]

    def __setitem__(self, idx, val):
        sub = self.arr.at[self._key(idx)].set(val)
        self.parent.arr = self.parent.arr.at[self.pkey].set(sub)

    @property
    def at(self):
        return _AtHelper(self)


def _emu_pallas_call(kernel, grid=None, in_specs=None, out_specs=None,
                     out_shape=None, scratch_shapes=(),
                     input_output_aliases=None, grid_spec=None, **_kw):
    nsp = 0
    if grid_spec is not None:
        # PrefetchScalarGridSpec: the first nsp inputs are scalar-prefetch
        # arrays, handed to the index maps and to the kernel (as leading
        # refs) — the compacted-grid plumbing (slab_kernel.build_pairs)
        nsp = grid_spec.num_scalar_prefetch
        grid = grid_spec.grid
        in_specs = grid_spec.in_specs
        out_specs = grid_spec.out_specs
        scratch_shapes = grid_spec.scratch_shapes
    out_list = isinstance(out_shape, (list, tuple))
    out_shapes = list(out_shape) if out_list else [out_shape]
    out_specs_l = list(out_specs) if isinstance(out_specs, (list, tuple)) else [out_specs]
    aliases = dict(input_output_aliases or {})

    def run(*inputs):
        scalar_refs = [FakeRef(a) for a in inputs[:nsp]]
        inputs = inputs[nsp:]
        outs = [jnp.zeros(o.shape, o.dtype) for o in out_shapes]
        # an aliased output shares the input's HBM buffer: it starts as the
        # input's contents, and aliased-input reads observe prior writes
        for k, tgt in aliases.items():
            outs[tgt] = jnp.asarray(inputs[k])
        scratch = [FakeRef(jnp.zeros(s.shape, s.dtype)) for s in scratch_shapes]
        # itertools.product iterates the LAST grid axis fastest — pallas order
        for idx in itertools.product(*[range(g) for g in grid]):
            _IDS[:] = idx

            def block(spec, arr):
                bi = spec.index_map(*idx, *scalar_refs)
                sl = tuple(
                    slice(int(b) * s, (int(b) + 1) * s)
                    for b, s in zip(bi, spec.block_shape)
                )
                return sl, arr[sl]

            in_refs = [
                FakeRef(block(s, outs[aliases[k]] if k in aliases else a)[1])
                for k, (s, a) in enumerate(zip(in_specs, inputs))
            ]
            out_sls, out_refs = [], []
            for spec, arr in zip(out_specs_l, outs):
                sl, blk = block(spec, arr)
                out_sls.append(sl)
                out_refs.append(FakeRef(blk))
            kernel(*scalar_refs, *in_refs, *out_refs, *scratch)
            for k, (sl, ref) in enumerate(zip(out_sls, out_refs)):
                outs[k] = outs[k].at[sl].set(ref.arr)
        return outs if out_list else outs[0]

    return run


_IDS = [0, 0, 0]


def _program_id(axis):
    return np.int32(_IDS[axis])


def _when(cond):
    def deco(f):
        if bool(cond):
            f()
        return f

    return deco


EMU_PL = SimpleNamespace(
    pallas_call=_emu_pallas_call,
    program_id=_program_id,
    when=_when,
    ds=_DS,
    multiple_of=lambda x, n: x,
    BlockSpec=real_pl.BlockSpec,
)

def _emu_prefetch_grid_spec(num_scalar_prefetch, grid=(), in_specs=None,
                            out_specs=None, scratch_shapes=()):
    return SimpleNamespace(
        num_scalar_prefetch=num_scalar_prefetch, grid=grid,
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )


EMU_PLTPU = SimpleNamespace(
    VMEM=lambda shape, dtype: SimpleNamespace(shape=shape, dtype=dtype),
    CompilerParams=lambda **kw: SimpleNamespace(**kw),
    # memory-space tag only (BlockSpec carries it through unexamined)
    SMEM=real_pltpu.SMEM,
    PrefetchScalarGridSpec=_emu_prefetch_grid_spec,
)


@contextlib.contextmanager
def emulate(*modules):
    """Swap each module's ``pl``/``pltpu`` for the emulator shims."""
    saved = []
    for mod in modules:
        saved.append((mod, getattr(mod, "pl", None), getattr(mod, "pltpu", None)))
        if hasattr(mod, "pl"):
            mod.pl = EMU_PL
        if hasattr(mod, "pltpu"):
            mod.pltpu = EMU_PLTPU
    try:
        yield
    finally:
        for mod, pl_, pltpu_ in saved:
            if pl_ is not None:
                mod.pl = pl_
            if pltpu_ is not None:
                mod.pltpu = pltpu_
