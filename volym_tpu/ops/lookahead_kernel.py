"""Pallas pre-pass kernels for importance-driven look-ahead.

The reference gates its march on "is an important object ahead of this
sample?" by probing K points towards the box exit per (pixel, step)
(``shaders/importance_driven_volume_rendering.wgsl:141-160`` straight,
``:94-139`` cone, consumed at ``:286-296``).  Probing forward is
gather-shaped and, worse, looks at slabs the forward march has not loaded
yet.  The slab-native formulation inverts it: a REVERSE march over the
importance volume carries, per ray, the march index of the next important
crossing ahead (``ns``), and emits one GATE bit per (chunk, march
step, ray): important-material-ahead (the continuum, K -> infinity,
limit of the reference's probe loop, including its quirky probe-range
end ``max_distance - length(pos)`` — a t-value minus a norm from the
world origin) AND the current step's importance sample non-opaque
(``wgsl:286-296``'s second condition, folded in here so the march
kernels never sample or stream the importance grid).  The forward kernel
then streams the gate plane like any other per-step input.  Semantics
match :func:`volym_tpu.render.slab.lookahead_bits` + the march-side
opacity compare (the jnp golden); the t-step golden keeps the
reference's exact discrete-probe parity.

Cost: one box-hat matmul per (chunk, slab) — with importance-occupancy
skipping AND zero-emission of blocks before the first important slab,
near the bare grid floor for typical sparse importance volumes.  The
cone variant carries 8 next-important indices, one per cone direction
re-anchored at the camera, sampling the main ray as a 9th lane block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volym_tpu.ops import slab_kernel as fwd_mod
from volym_tpu.ops.slab_kernel import (
    CF_CB,
    CF_CS,
    CF_RATE,
    CF_STRIDE,
    CF_RB,
    CF_RS,
    CF_TB,
    CF_TS,
    CONE_FEATURES,
    F_C2,
    F_CD,
    F_ENTRY,
    F_EXIT,
    F_SIGNOK,
    F_TS,
    N_FEATURES,
    RAYS_PER_CHUNK,
    SLAB_BATCH,
)

_FAR = 1e9  # "no important slab ahead" sentinel (march-index units)
IMPORTANT_AHEAD_THRESHOLD = 0.5
#: ternary pre-quantisation levels (lookahead_call): raw importance maps
#: to {0, 0.75, 1.5} so ONE slice stream answers both compares exactly —
#: probes test sample >= IMPORTANT_AHEAD_THRESHOLD (raw >= 0.5) and the
#: combined gate's current-step opacity tests sample >= OPAQUE_LEVEL
#: (raw >= IMPORTANCE_OPAQUE = 1.0).  All levels and their one-hot box
#: selections are bf16-exact, so the sampling matmuls stay single-pass.
OPAQUE_LEVEL = 1.5
#: static row-window width for the cone pre-pass's sampling matmul (one
#: dynamic start + fits bit per slab BATCH over the 9-family union).
#: Default OFF — re-measured NEGATIVE on the packed-plane kernel too
#: (r5): win=128 ballooned dense-importance cone 31.5 → 75-78 ms and
#: sparse 4.8 → 57-59 ms, with 16-aligned starts (bf16 sublane tiling)
#: no better — the windowed branch duplication + dynamic row slicing of
#: the packed bf16 block dwarf the halved matmul.  Plumbing kept
#: CI-pinned for architectures where the balance differs:
#: VOLYM_CONE_WIN=128 enables.
CONE_WIN_ROWS = int(__import__("os").environ.get("VOLYM_CONE_WIN", "0"))


def _row(feat, i):
    return feat[i : i + 1, :]


def _coords_t(feat, jf):
    from volym_tpu.ops.slab_kernel import F_CB, F_CS, F_RB, F_RS, F_TB

    rows_c = _row(feat, F_RS) * jf + _row(feat, F_RB)
    cols_c = _row(feat, F_CS) * jf + _row(feat, F_CB)
    t = _row(feat, F_TS) * jf + _row(feat, F_TB)
    return rows_c, cols_c, t


def _boxhat_sample(slice_ref, slice_row, rows_c, cols_c, nr, nc, rays, win_rows, feat, t, r0=None):
    """Nearest (box-hat) sample of one slice at the ray crossings."""

    def boxk(coords, idx):
        d = coords - idx
        return ((d >= -0.5) & (d < 0.5)).astype(jnp.float32)

    def iota(n, base=None):
        v = jax.lax.broadcasted_iota(jnp.int32, (n, rays), 0).astype(jnp.float32)
        return v if base is None else v + base.astype(jnp.float32)

    if win_rows:
        assert r0 is not None, "windowed sampling needs a precomputed r0"
        hat_y = boxk(rows_c, iota(win_rows, r0))
        sl = slice_ref[slice_row, pl.ds(r0, win_rows), :]
    else:
        hat_y = boxk(rows_c, iota(nr))
        sl = slice_ref[slice_row]
    # DEFAULT (single-pass bf16 MXU) is EXACT here: the box hats are
    # one-hot {0,1} and the importance slices are pre-quantised to the
    # ternary levels {0, 0.75, 1.5} (lookahead_call's combined gate
    # encoding), all exactly representable in bf16, so every product and
    # the <=1-term sums are bf16-exact — 6x fewer MXU passes than HIGHEST
    colvals = jax.lax.dot_general(
        sl, hat_y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return jnp.sum(colvals * boxk(cols_c, iota(nc)), axis=0, keepdims=True)


def _straight_kernel(
    feat_ref,   # (1, 16, R)
    slice_ref,  # (sb, NR, NC) importance slices (physical order)
    *rest,      # [meta_ref if occupancy|win] [ns_in_ref if inverted]
                # ahead_ref, [ns_out_ref if inverted] ns_ref (scratch)
    win_rows: int,
    slab_batch: int,
    march_sign: int,
    n_blocks: int,
    occupancy: bool,
    inverted: bool = False,
    subtexel: int = 0,
):
    rest = list(rest)
    meta_ref = rest.pop(0) if (occupancy or win_rows) else None
    if inverted:
        ns_in_ref, ahead_ref, ns_out_ref, ns_ref = rest
        jb = pl.program_id(0)
        ns_ref[:] = ns_in_ref[0]
    else:
        ahead_ref, ns_ref = rest
        jb = pl.program_id(1)

        @pl.when(jb == 0)
        def _init():
            ns_ref[:] = jnp.full_like(ns_ref, _FAR)

    mb = n_blocks - 1 - jb  # march-order block (marching far -> near)
    nr, nc = slice_ref.shape[1], slice_ref.shape[2]

    def steps(flags, r0s):
        for i in reversed(range(slab_batch)):
            _straight_step(
                feat_ref, slice_ref, ahead_ref, ns_ref,
                j=mb * slab_batch + i,
                row=i,
                slice_row=i if march_sign > 0 else slab_batch - 1 - i,
                win_rows=win_rows,
                occupied=None if flags in (None, False) else flags[i],
                r0=None if r0s is None else r0s[i],
                sample=flags is not False,
                subtexel=subtexel,
            )

    # footprint flags + window starts precomputed once per frame
    # (fwd_mod.build_step_meta on the importance occupancy grid), indexed
    # by the MARCH block mb via the meta BlockSpec
    flags, block_occ, r0s, _, _ = fwd_mod._read_step_meta(
        meta_ref, slab_batch, win_rows, 0, occupancy
    )
    if not occupancy:
        steps(None, r0s)
    else:
        # Three-way block gate.  Live: sample + emit.  Dead (union-
        # unoccupied) with some ns already set: emit-only (branch-free
        # ahead rows).  Dead AND no ns set anywhere (the sweep has not
        # passed an important slab yet — for an empty importance volume,
        # EVERY block): every ahead bit is identically false, so one
        # vector store replaces the per-step valid/norm/compare chain —
        # the pre-pass collapses toward the bare grid floor.
        ns_any = jnp.any(ns_ref[:] < _FAR * 0.5)

        @pl.when(block_occ)
        def _live():
            steps(flags, r0s)

        @pl.when(jnp.logical_not(block_occ) & ns_any)
        def _dead():
            steps(False, None)

        @pl.when(jnp.logical_not(block_occ) & jnp.logical_not(ns_any))
        def _dead_clean():
            ahead_ref[0] = jnp.zeros_like(ahead_ref[0])

    if inverted:
        ns_out_ref[0] = ns_ref[:]


def _straight_step(feat_ref, slice_ref, ahead_ref, ns_ref, *, j, row, slice_row, win_rows, occupied=None, r0=None, sample=True, subtexel=0):
    from volym_tpu.render import slab as slab_mod

    jf = j.astype(jnp.float32) if hasattr(j, "astype") else jnp.float32(j)
    feat = feat_ref[0]
    nr, nc = slice_ref.shape[1], slice_ref.shape[2]
    rays = feat.shape[-1]
    rows_c, cols_c, t = _coords_t(feat, jf)
    # snapped like the march's own sampler coords (slab_kernel._march_step):
    # the emitted gate bit folds in the CURRENT-step opacity compare the
    # march kernel used to evaluate itself, so this sample must be the
    # march's sample bit-for-bit (box selection commutes with the
    # pre-binarisation, so sample(binarise(V)) == binarise(sample(V)))
    rows_c = slab_mod.snap(jnp.clip(rows_c, 0.0, nr - 1.0), subtexel)
    cols_c = slab_mod.snap(jnp.clip(cols_c, 0.0, nc - 1.0), subtexel)
    valid = (
        (_row(feat, F_SIGNOK) > 0.5)
        & (t >= _row(feat, F_ENTRY))
        & (t < _row(feat, F_EXIT))
    )

    # probe-range end in march-index units, with the reference's
    # max_distance - length(pos) quirk
    norm_pos = jnp.sqrt(
        jnp.maximum(
            _row(feat, F_C2) + 2.0 * t * _row(feat, F_CD) + t * t, 0.0
        )
    )
    m_end = jf + (_row(feat, F_EXIT) - norm_pos) / _row(feat, F_TS)
    ahead = (ns_ref[:] <= m_end) & valid
    # default: gate bit == ahead (a footprint-empty step has current
    # importance exactly 0 -> non-opaque -> the compare is vacuous)
    ahead_ref[0, row] = ahead.astype(jnp.float32)

    if not sample:
        return

    def _sample_update():
        s = _boxhat_sample(
            slice_ref, slice_row, rows_c, cols_c, nr, nc, rays, win_rows,
            feat, t, r0=r0,
        )
        hit = (s >= IMPORTANT_AHEAD_THRESHOLD) & valid
        # COMBINED gate bit: important-ahead AND current sample non-opaque
        # (wgsl:286-296's two conditions) — the march kernels gate on this
        # bit alone and never touch the importance grid
        ahead_ref[0, row] = (
            ahead & jnp.logical_not(s >= OPAQUE_LEVEL)
        ).astype(jnp.float32)
        ns_ref[:] = jnp.where(hit, jf, ns_ref[:])

    if occupied is None:
        _sample_update()
    else:
        @pl.when(occupied)
        def _do():
            _sample_update()


def _cone_kernel(
    feat_ref,   # (1, 16, R) main-ray features
    cfeat_ref,  # (1, CONE_FEATURES, R) per-cone-direction coefficients
    slice_ref,  # (sb, NR, NC) importance slices
    *rest,      # [meta_ref if occupancy] [ns_in_ref if inverted] ahead_ref,
                # [ns_out_ref if inverted] ns_ref (scratch, (8, R))
    slab_batch: int,
    march_sign: int,
    n_blocks: int,
    occupancy: bool,
    inverted: bool = False,
    subtexel: int = 0,
    win_rows: int = 0,
    nc: int = 0,
):
    rest = list(rest)
    meta_ref = rest.pop(0) if occupancy else None
    if inverted:
        ns_in_ref, ahead_ref, ns_out_ref, ns_ref = rest
        jb = pl.program_id(0)
        ns_ref[:] = ns_in_ref[0]
    else:
        ahead_ref, ns_ref = rest
        jb = pl.program_id(1)

        @pl.when(jb == 0)
        def _init():
            ns_ref[:] = jnp.full_like(ns_ref, _FAR)

    mb = n_blocks - 1 - jb

    def steps(flags, win=0, r0=None):
        for i in reversed(range(slab_batch)):
            _cone_step(
                feat_ref, cfeat_ref, slice_ref, ahead_ref, ns_ref,
                j=mb * slab_batch + i,
                row=i,
                slice_row=i if march_sign > 0 else slab_batch - 1 - i,
                occupied=None if flags in (None, False) else flags[i],
                sample=flags is not False,
                subtexel=subtexel,
                win_rows=win,
                r0=r0,
                nc=nc,
            )

    if not occupancy:
        steps(None)
    else:
        # per-step UNION footprint flags over the 8 cone directions + the
        # main ray, precomputed once per frame (build_cone_step_meta);
        # three-way block gate as in _straight_kernel — a union-unoccupied
        # block with NO ns set anywhere emits identically-false bits with
        # one vector store
        flags, block_occ, _, _, _ = fwd_mod._read_step_meta(
            meta_ref, slab_batch, 0, 0, True
        )
        ns_any = jnp.any(ns_ref[:] < _FAR * 0.5)

        if win_rows:
            # per-BATCH row window over the 9-family union (layout:
            # [block_occ, flags[0..sb), r0_b, fits_b]); the multiple_of
            # hint lets Mosaic accept the dynamic sublane start
            r0_b = pl.multiple_of(meta_ref[0, 0, 0, 1 + slab_batch], 16)
            fits_b = meta_ref[0, 0, 0, 1 + slab_batch + 1] > 0

            @pl.when(block_occ & fits_b)
            def _live_win():
                steps(flags, win=win_rows, r0=r0_b)

            @pl.when(block_occ & jnp.logical_not(fits_b))
            def _live_full():
                steps(flags)
        else:
            @pl.when(block_occ)
            def _live():
                steps(flags)

        @pl.when(jnp.logical_not(block_occ) & ns_any)
        def _dead():
            steps(False)

        @pl.when(jnp.logical_not(block_occ) & jnp.logical_not(ns_any))
        def _dead_clean():
            ahead_ref[0] = jnp.zeros_like(ahead_ref[0])

    if inverted:
        ns_out_ref[0] = ns_ref[:]


def build_cone_step_meta(cone_feats, occ, feats, *, n_slabs, sb, sign, nr, nc, win=0):
    """Per-(chunk, march-block) UNION footprint meta of the 8 cone
    look-ahead directions AND the main ray (whose current-step sample
    feeds the combined gate bit) vs the importance occupancy grid,
    precomputed once per frame as XLA ops (the cone analog of
    :func:`volym_tpu.ops.slab_kernel.build_step_meta`).

    Packed layout ``[block_occ, flags[0..sb)]`` plus, when ``win`` is
    nonzero, one per-BATCH row window ``[r0_b, fits_b]`` covering the
    9-family coordinate union — the wide sampling matmul's y contraction
    shrinks nr/win on fitting batches (one branch per batch, as in the
    forward's column window).

    Returns int32 (C, n_blocks, 1, 1 + sb [+ 2]).
    """
    n_dirs = CONE_FEATURES // CF_STRIDE
    n_blocks = n_slabs // sb
    jf = jnp.arange(n_slabs, dtype=jnp.float32)[None, :, None]  # (1, S, 1)

    def frow(i):
        return feats[:, i, :][:, None, :]  # (C, 1, R)

    rmin = rmax = cmin = cmax = anyin = None
    families = [None] + list(range(n_dirs))  # main ray first
    for c in families:
        if c is None:
            from volym_tpu.ops.slab_kernel import (
                F_CB, F_CS, F_ENTRY, F_EXIT, F_RB, F_RS, F_TB,
            )

            rows_u = frow(F_RS) * jf + frow(F_RB)
            cols_u = frow(F_CS) * jf + frow(F_CB)
            t_m = frow(F_TS) * jf + frow(F_TB)
            inbox = (
                (frow(F_SIGNOK) > 0.5)
                & (t_m >= frow(F_ENTRY))
                & (t_m < frow(F_EXIT))
            )
        else:
            base = c * CF_STRIDE

            def crow(i, base=base):
                return cone_feats[:, base + i, :][:, None, :]  # (C, 1, R)

            rows_u = crow(CF_RS) * jf + crow(CF_RB)  # (C, S, R)
            cols_u = crow(CF_CS) * jf + crow(CF_CB)
            t_c = crow(CF_TS) * jf + crow(CF_TB)
            inbox = (
                (rows_u >= -0.5) & (rows_u <= nr - 0.5)
                & (cols_u >= -0.5) & (cols_u <= nc - 0.5)
                & (t_c > 0.0)
            )
        rows_c = jnp.clip(rows_u, 0.0, nr - 1.0)
        cols_c = jnp.clip(cols_u, 0.0, nc - 1.0)
        rmin_c = jnp.min(jnp.where(inbox, rows_c, jnp.float32(nr)), axis=2)
        rmax_c = jnp.max(jnp.where(inbox, rows_c, jnp.float32(-1.0)), axis=2)
        cmin_c = jnp.min(jnp.where(inbox, cols_c, jnp.float32(nc)), axis=2)
        cmax_c = jnp.max(jnp.where(inbox, cols_c, jnp.float32(-1.0)), axis=2)
        any_c = jnp.any(inbox, axis=2)  # (C, S)
        if rmin is None:
            rmin, rmax, cmin, cmax, anyin = rmin_c, rmax_c, cmin_c, cmax_c, any_c
        else:
            rmin = jnp.minimum(rmin, rmin_c)
            rmax = jnp.maximum(rmax, rmax_c)
            cmin = jnp.minimum(cmin, cmin_c)
            cmax = jnp.maximum(cmax, cmax_c)
            anyin = anyin | any_c

    # march step j reads physical slab j (sign>0) or n_slabs-1-j
    sidx = jnp.arange(n_slabs) if sign > 0 else n_slabs - 1 - jnp.arange(n_slabs)
    ob = occ[sidx] > 0.5  # (S, br, bc) march order
    br, bc = ob.shape[1], ob.shape[2]
    blk = fwd_mod.OCC_BLOCK
    by = (jnp.arange(br, dtype=jnp.float32) * blk)[None, None, :, None]
    bx = (jnp.arange(bc, dtype=jnp.float32) * blk)[None, None, None, :]
    inside = (
        (by + (blk - 1) >= (rmin - 1.0)[:, :, None, None])
        & (by <= (rmax + 1.0)[:, :, None, None])
        & (bx + (blk - 1) >= (cmin - 1.0)[:, :, None, None])
        & (bx <= (cmax + 1.0)[:, :, None, None])
    )  # (C, S, br, bc)
    hit = jnp.any(ob[None] & inside, axis=(2, 3))  # (C, S)
    flags = (hit & anyin).reshape(-1, n_blocks, sb)
    block_occ = jnp.any(flags, axis=2, keepdims=True)
    cols = [block_occ.astype(jnp.int32), flags.astype(jnp.int32)]
    if win:
        # one row window per BATCH over the 9-family union (box-hat
        # support is the single nearest voxel, so covering the clamped
        # coordinates themselves suffices; clip already bounds them)
        sh_b = anyin.reshape(-1, n_blocks, sb)
        lo_b = jnp.min(
            jnp.where(sh_b, rmin.reshape(-1, n_blocks, sb), jnp.float32(nr)),
            axis=2,
        )
        hi_b = jnp.max(
            jnp.where(sh_b, rmax.reshape(-1, n_blocks, sb), jnp.float32(-1.0)),
            axis=2,
        )
        any_b = jnp.any(sh_b, axis=2)
        # 16-aligned starts: the packed planes stream as bf16 whose
        # sublane tiling is (16, 128) — an 8-aligned dynamic row offset
        # forces a Mosaic realign copy per slice (measured catastrophic)
        r0_b = jnp.clip(
            jnp.floor((lo_b - 1.0) / 16.0) * 16.0,
            0.0,
            # keep the multiple_of(16) promise: the upper clamp must also
            # be 16-aligned (nr - win need not be)
            float(((nr - win) // 16) * 16),
        )
        fits_b = any_b & (hi_b <= r0_b + win - 1.0) & (lo_b >= r0_b)
        cols.append(r0_b.astype(jnp.int32)[:, :, None])
        cols.append(fits_b.astype(jnp.int32)[:, :, None])
    return jnp.concatenate(cols, axis=2)[:, :, None, :]


def _cone_step(feat_ref, cfeat_ref, slice_ref, ahead_ref, ns_ref, *, j, row, slice_row, occupied=None, sample=True, subtexel=0, win_rows=0, r0=None, nc=0):
    from volym_tpu.render import slab as slab_mod

    jf = j.astype(jnp.float32) if hasattr(j, "astype") else jnp.float32(j)
    feat = feat_ref[0]
    cf = cfeat_ref[0]  # (CONE_FEATURES, R)
    # slice_ref holds the PACKED bit planes (sb, nr, 2*ncw): 8 importance
    # columns per bf16 word (ints 0..255 — exactly representable), the
    # ahead plane (raw >= 0.5) in words [0, ncw) and the opaque plane
    # (raw >= IMPORTANCE_OPAQUE) in words [ncw, 2*ncw); nc is the
    # UNPACKED column count (static)
    nr, ncw2 = slice_ref.shape[1], slice_ref.shape[2]
    ncw = ncw2 // 2
    rays = feat.shape[-1]
    rows_m, cols_m, t = _coords_t(feat, jf)
    # main-ray sampler coords, snapped like the march's (see _straight_step)
    rows_m = slab_mod.snap(jnp.clip(rows_m, 0.0, nr - 1.0), subtexel)
    cols_m = slab_mod.snap(jnp.clip(cols_m, 0.0, nc - 1.0), subtexel)
    valid = (
        (_row(feat, F_SIGNOK) > 0.5)
        & (t >= _row(feat, F_ENTRY))
        & (t < _row(feat, F_EXIT))
    )
    norm_pos = jnp.sqrt(
        jnp.maximum(
            _row(feat, F_C2) + 2.0 * t * _row(feat, F_CD) + t * t, 0.0
        )
    )
    d_range = _row(feat, F_EXIT) - norm_pos  # world distance

    n_dirs = CONE_FEATURES // CF_STRIDE
    ahead = jnp.zeros((1, rays), bool)
    for c in range(n_dirs):
        rate = cf[c * CF_STRIDE + CF_RATE : c * CF_STRIDE + CF_RATE + 1, :]
        # loads of ns_ref happen BEFORE this step's update below (a cone
        # probe looks strictly ahead of the current sample)
        ahead = ahead | (
            (ns_ref[c : c + 1, :] <= jf + d_range * rate) & (rate > 0.0)
        )
    ahead_ref[0, row] = (ahead & valid).astype(jnp.float32)

    if not sample:
        return

    def _sample_update():
        # ONE wide matmul for all directions + the main ray: per-direction
        # box hats are stacked along the lane axis ((nr, (n_dirs+1)*R)
        # instead of separate (nr, R) contractions) — same FLOPs, deeper
        # MXU N dim, one dispatch.  Still single-pass bf16-exact: hats are
        # one-hot and the importance slices pre-binarised
        # (see _boxhat_sample).  The extra main-ray lane block feeds the
        # COMBINED gate bit (current sample non-opaque), snapped like the
        # march's own sampler coords.
        # Box selection commutes with thresholding, so sampling the packed
        # BIT planes reproduces the ternary compares exactly: the box hat
        # picks column k = floor(snapped + 0.5); its word floor(k/8) rides
        # the single-pass bf16 row matmul (one-hot x 8-bit ints — exact in
        # the f32 accumulator, 8x fewer MXU FLOPs AND an 8x narrower
        # word-select chain than the unpacked x contraction), and the bit
        # k mod 8 extracts with exact power-of-two float arithmetic.
        rows_s, w_s, b_s, inbox_l = [], [], [], []

        def wb(cols_snapped, plane):
            k = jnp.floor(cols_snapped + 0.5)  # the box-selected column
            w = jnp.floor(k * 0.125)
            return w + jnp.float32(plane * ncw), k - 8.0 * w

        for c in range(n_dirs):
            base = c * CF_STRIDE

            def crow(i, base=base):
                return cf[base + i : base + i + 1, :]

            rows_u = crow(CF_RS) * jf + crow(CF_RB)
            cols_u = crow(CF_CS) * jf + crow(CF_CB)
            t_c = crow(CF_TS) * jf + crow(CF_TB)
            inbox_l.append(
                (rows_u >= -0.5) & (rows_u <= nr - 0.5)
                & (cols_u >= -0.5) & (cols_u <= nc - 0.5)
                & (t_c > 0.0)
            )
            rows_s.append(
                slab_mod.snap(jnp.clip(rows_u, 0.0, nr - 1.0), subtexel)
            )
            w, b = wb(
                slab_mod.snap(jnp.clip(cols_u, 0.0, nc - 1.0), subtexel), 0
            )
            w_s.append(w)
            b_s.append(b)
        rows_s.append(rows_m)
        w, b = wb(cols_m, 1)  # main lane reads the OPAQUE plane
        w_s.append(w)
        b_s.append(b)
        rows_all = jnp.concatenate(rows_s, axis=1)  # (1, (n_dirs+1)*R)
        w_all = jnp.concatenate(w_s, axis=1)
        b_all = jnp.concatenate(b_s, axis=1)
        lanes = (n_dirs + 1) * rays

        def boxk(coords, idx):
            d = coords - idx
            return ((d >= -0.5) & (d < 0.5)).astype(jnp.float32)

        def iota(n, base=None):
            v = jax.lax.broadcasted_iota(jnp.int32, (n, lanes), 0).astype(
                jnp.float32
            )
            return v if base is None else v + base.astype(jnp.float32)

        if win_rows:
            assert r0 is not None, "windowed sampling needs a precomputed r0"
            hat_y = boxk(rows_all, iota(win_rows, r0))
            sl = slice_ref[slice_row, pl.ds(r0, win_rows), :]
        else:
            hat_y = boxk(rows_all, iota(nr))
            sl = slice_ref[slice_row]
        words = jax.lax.dot_general(
            sl, hat_y.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (2*ncw, lanes) — the selected rows' words, exact
        wordv = jnp.sum(
            words * boxk(w_all, iota(ncw2)), axis=0, keepdims=True
        )
        # 2^b via exact selects (libm exp2 rounding is not trusted here)
        p2 = jnp.full_like(b_all, 1.0)
        for i in range(1, 8):
            p2 = jnp.where(b_all == jnp.float32(i), jnp.float32(2.0 ** i), p2)
        bit = jnp.floor(wordv / p2) - 2.0 * jnp.floor(wordv / (2.0 * p2))
        for c in range(n_dirs):
            s = bit[:, c * rays : (c + 1) * rays]
            hit = (s > 0.5) & inbox_l[c]
            ns_ref[c : c + 1, :] = jnp.where(hit, jf, ns_ref[c : c + 1, :])
        s_main = bit[:, n_dirs * rays :]
        ahead_ref[0, row] = (
            (ahead & valid) & jnp.logical_not(s_main > 0.5)
        ).astype(jnp.float32)

    if occupied is None:
        _sample_update()
    else:
        # the union-footprint flag comes precomputed from
        # build_cone_step_meta; a union-unoccupied step can update nothing
        # (every direction's samples are sub-threshold)
        @pl.when(occupied)
        def _do():
            _sample_update()


def lookahead_call(sign: int, imp_perm, feats, cone_feats=None, win_rows: int = 0, subtexel: int = 0):
    """Run the reverse pre-pass -> GATE bits (C, n_slabs, 1, R) float32.

    The emitted bit is the march's complete skip decision
    (``wgsl:286-296``): important-material-ahead AND the current sample's
    importance non-opaque — the current-step box sample rides the same
    reverse sweep (snapped sampler coords, pre-binarised slices), so the
    march kernels gate on this bit alone and never sample or stream the
    importance grid themselves.

    ``cone_feats`` selects the 8-direction cone variant (``None`` =
    straight).  ``win_rows`` as in the forward (straight only — cone
    directions have their own footprints).  ``subtexel`` =
    ``RenderParams.subtexel_bits`` (sampler fixed-point snap)."""
    n_chunks = feats.shape[0]
    n_slabs, nr, nc = imp_perm.shape
    sb = SLAB_BATCH if n_slabs % SLAB_BATCH == 0 else 1
    n_blocks = n_slabs // sb
    occupancy = nr % fwd_mod.OCC_BLOCK == 0 and nc % fwd_mod.OCC_BLOCK == 0
    # the pre-pass only ever THRESHOLDS importance — pre-quantise to the
    # ternary levels (see OPAQUE_LEVEL) so the sampling matmuls run
    # single-pass bf16 and stay exact for BOTH compares
    from volym_tpu.render.slab import IMPORTANCE_OPAQUE

    packed = cone_feats is not None
    if packed:
        # cone path: 8-bit-packed bit planes — ahead (raw >= 0.5) and
        # opaque (raw >= IMPORTANCE_OPAQUE) — words 0..255 as bf16 ints
        # (exact).  8x fewer sampling-matmul FLOPs, an 8x narrower word
        # select in place of the per-lane column chain, and 16x less
        # slice DMA than the ternary f32 stream (see _cone_step).
        weights = jnp.asarray([2.0 ** i for i in range(8)], jnp.float32)
        # pad columns to a word multiple: clipped sampler coords never
        # select a column >= nc, so zero-padded tail bits are never read
        ncp = ((nc + 7) // 8) * 8

        def pack(bits):
            if ncp != nc:
                bits = jnp.pad(bits, ((0, 0), (0, 0), (0, ncp - nc)))
            b = bits.reshape(n_slabs, nr, ncp // 8, 8).astype(jnp.float32)
            return jnp.einsum("srwb,b->srw", b, weights)

        occ_src = imp_perm
        imp_perm = jnp.concatenate(
            [
                pack(imp_perm >= IMPORTANT_AHEAD_THRESHOLD),
                pack(imp_perm >= IMPORTANCE_OPAQUE),
            ],
            axis=2,
        ).astype(jnp.bfloat16)
    else:
        occ_src = None
        imp_perm = (
            0.75 * (imp_perm >= IMPORTANT_AHEAD_THRESHOLD).astype(jnp.float32)
            + 0.75 * (imp_perm >= IMPORTANCE_OPAQUE).astype(jnp.float32)
        )
    inverted = n_chunks >= fwd_mod.INVERT_MIN_CHUNKS

    W = (lambda f: (lambda j, c: f(c, j))) if inverted else (lambda f: f)
    # physical slab block for reverse-march grid step jb
    slice_index = W(
        (lambda c, j: (n_blocks - 1 - j, 0, 0))
        if sign > 0
        else (lambda c, j: (j, 0, 0))
    )
    ahead_index = W(lambda c, j: (c, n_blocks - 1 - j, 0, 0))  # march order

    in_specs = [
        pl.BlockSpec((1, N_FEATURES, RAYS_PER_CHUNK), W(lambda c, j: (c, 0, 0))),
    ]
    inputs = [feats]
    if cone_feats is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, CONE_FEATURES, RAYS_PER_CHUNK), W(lambda c, j: (c, 0, 0))
            )
        )
        inputs.append(cone_feats)
    in_specs.append(
        pl.BlockSpec((sb, nr, imp_perm.shape[2]), slice_index)
    )
    inputs.append(imp_perm)
    # footprint flags + window starts precomputed per frame, indexed by
    # the MARCH block mb = n_blocks - 1 - jb of the reverse sweep
    # (occupancy from the UNPACKED values when the cone path packed them)
    occ = (
        fwd_mod.occupancy_grid(
            occ_src if occ_src is not None else imp_perm,
            IMPORTANT_AHEAD_THRESHOLD,
        )
        if occupancy
        else None
    )
    meta_index = W(lambda c, j: (c, n_blocks - 1 - j, 0, 0))
    cone_win = CONE_WIN_ROWS if (cone_feats is not None and nr > CONE_WIN_ROWS) else 0
    if cone_feats is not None:
        # the meta unions the MAIN ray's footprint as a 9th family: the
        # combined gate bit samples the current (main-ray) position in
        # the same sweep (build_cone_step_meta)
        meta = (
            build_cone_step_meta(
                cone_feats, occ, feats, n_slabs=n_slabs, sb=sb, sign=sign,
                nr=nr, nc=nc, win=cone_win,
            )
            if occupancy
            else None
        )
    else:
        meta = fwd_mod.build_step_meta(
            feats, occ, n_slabs=n_slabs, sb=sb, sign=sign, nr=nr, nc=nc,
            margin=1.0, win_rows=win_rows,
        )
    if meta is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, meta.shape[3]), meta_index, memory_space=pltpu.SMEM
            )
        )
        inputs.append(meta)

    n_dirs = CONE_FEATURES // CF_STRIDE if cone_feats is not None else 1
    if cone_feats is not None:
        kernel = partial(
            _cone_kernel, slab_batch=sb, march_sign=sign, n_blocks=n_blocks,
            occupancy=occupancy, inverted=inverted, subtexel=subtexel,
            win_rows=cone_win, nc=nc,
        )
    else:
        kernel = partial(
            _straight_kernel, win_rows=win_rows, slab_batch=sb,
            march_sign=sign, n_blocks=n_blocks, occupancy=occupancy,
            inverted=inverted, subtexel=subtexel,
        )
    scratch = [pltpu.VMEM((n_dirs, RAYS_PER_CHUNK), jnp.float32)]

    aliases = {}
    out_specs = [pl.BlockSpec((1, sb, 1, RAYS_PER_CHUNK), ahead_index)]
    out_shape = [
        jax.ShapeDtypeStruct((n_chunks, n_slabs, 1, RAYS_PER_CHUNK), jnp.float32)
    ]
    if inverted:
        # per-chunk next-important state round-trips through an aliased
        # HBM block between revisits (see fwd_mod.INVERT_MIN_CHUNKS)
        in_specs.append(
            pl.BlockSpec((1, n_dirs, RAYS_PER_CHUNK), W(lambda c, j: (c, 0, 0)))
        )
        inputs.append(
            jnp.full((n_chunks, n_dirs, RAYS_PER_CHUNK), _FAR, jnp.float32)
        )
        aliases = {len(inputs) - 1: 1}
        out_specs.append(
            pl.BlockSpec((1, n_dirs, RAYS_PER_CHUNK), W(lambda c, j: (c, 0, 0)))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((n_chunks, n_dirs, RAYS_PER_CHUNK), jnp.float32)
        )

    res = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks) if inverted else (n_chunks, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs if inverted else out_specs[0],
        out_shape=out_shape if inverted else out_shape[0],
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=fwd_mod.vmem_params(
            False,
            slice_bytes=sb * nr * imp_perm.shape[2]
            * (2 if imp_perm.dtype == jnp.bfloat16 else 4),
        ),
    )(*inputs)
    return res[0] if inverted else res
