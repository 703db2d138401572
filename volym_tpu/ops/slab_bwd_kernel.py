"""Pallas TPU backward for the slab-marching renderer.

Two passes, both gather/scatter-free (the point of the slab formulation —
the backward's scatter into the voxel grid becomes dense slice-shaped
matmul accumulation, SURVEY.md section 7 hard part (b)):

Pass 1 — replay (grid (chunks, slab blocks), blocks fastest): re-runs the
forward compositing recurrence per ray chunk, reconstructs per-step
transmittance from the running accumulator and suffix sums from the final
image (same identity as render/diff.py), and emits
  * ``d_density`` (chunks, slabs, rays): the per-step density cotangent,
    chained through the TF hat lookup;
  * ``d_lut`` accumulated across the whole grid (one revisited block).

Pass 2 — voxel gradients (grid (slab blocks, chunks), chunks fastest): for
each slab, accumulates

    d_slice[y, x] = sum_r hat_y[y, r] * hat_x[x, r] * d_density[r]
                  = (hat_y  @  (hat_x * d_density)^T)         — one MXU op

into the permuted gradient volume.

Both passes share the forward's two big levers (round-2): ``SLAB_BATCH``
sub-slabs per grid step (amortising the per-step grid+DMA floor) and the
static per-camera windowed y contraction (``slab_kernel.window_rows``),
which cuts the replay matmul's contraction dim and the voxel-grad matmul's
output rows by n_rows/win_rows.

The replay also emits the feats cotangent (one extra dhat_y matmul per
step): d(rows/cols slopes+intercepts) through the bilinear hats and
d(aexp) through the opacity correction.  The feats -> camera chain
(_pack_features) is jnp and autodiffs outside the kernel, so camera-pose
optimisation runs fully on the Pallas path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volym_tpu.ops import slab_kernel as fwd_mod
from volym_tpu.ops.slab_kernel import (
    F_AEXP,
    F_CB,
    F_CS,
    F_ENTRY,
    F_EXIT,
    F_HX,
    F_HY,
    F_HZ,
    F_RB,
    F_RS,
    F_SIGNOK,
    F_TB,
    F_TS,
    N_FEATURES,
    RAYS_PER_CHUNK,
    SLAB_BATCH,
)

_EPS = 1e-7
#: opt-in column windowing for the backward kernels (see _backward_call)
BWD_WIN_COLS = int(__import__("os").environ.get("VOLYM_BWD_WIN_COLS", "0"))
_LOG_FLOOR = 1e-37


def _coords(feat, jf, nr, nc, subtexel=0):
    from volym_tpu.render import slab as slab_mod

    rows_c = feat[F_RS : F_RS + 1, :] * jf + feat[F_RB : F_RB + 1, :]
    cols_c = feat[F_CS : F_CS + 1, :] * jf + feat[F_CB : F_CB + 1, :]
    t = feat[F_TS : F_TS + 1, :] * jf + feat[F_TB : F_TB + 1, :]
    return (
        slab_mod.snap(jnp.clip(rows_c, 0.0, nr - 1.0), subtexel),
        slab_mod.snap(jnp.clip(cols_c, 0.0, nc - 1.0), subtexel),
        t,
    )


def _hat(coords, n, rays, bilinear, base=None):
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, rays), 0).astype(jnp.float32)
    if base is not None:
        idx = idx + base.astype(jnp.float32)
    d = coords - idx
    if bilinear:
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return ((d >= -0.5) & (d < 0.5)).astype(jnp.float32)


def _dhat(coords, n, rays, bilinear, base=None):
    """d hat / d coord (None for the box kernel, whose derivative is 0).

    Half-open subgradient convention at the hat's kinks, matching autodiff
    of the goldens' floor-based bilinear (``slab._bilinear_slice``): at a
    coordinate exactly ON texel i (d == 0 — probability ~2^-subtexel_bits
    per sample under coordinate snapping) the derivative is the RIGHT-sided
    difference v[i+1] - v[i], i.e. dhat(0) = -1 and dhat(-1) = +1 (the
    support extends to d == -1), while dhat(+1) = 0.  Interior only — at
    clamped coordinates the raw-coordinate ``rows_in``/``cols_in`` masks
    zero the chain before the convention matters."""
    if not bilinear:
        return None
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, rays), 0).astype(jnp.float32)
    if base is not None:
        idx = idx + base.astype(jnp.float32)
    d = coords - idx
    return jnp.where(
        (d >= -1.0) & (d < 1.0),
        jnp.where(d >= 0.0, -1.0, 1.0),
        0.0,
    )


def _smooth_row_dts(feat, jf, d_rows, i, num_steps, bilinear, nr=None, nc=None):
    """d(smoothed density)/d(F_TS) at sub-step i — the transpose of
    :func:`slab_kernel._smooth_row`'s dependence on the per-ray tap offset
    ``u = delta / ts``: the in-box masks and ``wsum`` are indicators (zero
    gradient a.e.), so only the stencil kernel ``ker(u - off)`` chains,
    with ``du/dts = -delta / ts**2``.  Box (nearest) kernels have zero
    derivative -> returns zeros."""
    import math as _math

    from volym_tpu.render.golden import (
        GAUSSIAN_KERNEL_SIZE,
        GAUSSIAN_SIGMA,
        GAUSSIAN_STEP,
    )

    ts = feat[F_TS : F_TS + 1, :]
    if not bilinear:
        return jnp.zeros_like(ts)
    rs = feat[F_RS : F_RS + 1, :]
    cs = feat[F_CS : F_CS + 1, :]
    rows_raw = rs * jf + feat[F_RB : F_RB + 1, :]
    cols_raw = cs * jf + feat[F_CB : F_CB + 1, :]
    n = jnp.float32(num_steps)
    bnd_r = jnp.float32(num_steps if nr is None else nr)
    bnd_c = jnp.float32(num_steps if nc is None else nc)
    total = jnp.zeros_like(rows_raw)
    dtotal_dts = jnp.zeros_like(rows_raw)
    wsum = jnp.zeros_like(rows_raw)
    for tap in range(-GAUSSIAN_KERNEL_SIZE, GAUSSIAN_KERNEL_SIZE + 1):
        delta = tap * GAUSSIAN_STEP
        w = _math.exp(-(delta * delta) / (2.0 * GAUSSIAN_SIGMA * GAUSSIAN_SIGMA))
        u = delta / jnp.where(ts == 0.0, 1.0, ts)  # padded-lane guard (see fwd _smooth_row)
        rt = rows_raw + u * rs
        ct = cols_raw + u * cs
        st = jf + u
        in_box = (
            (rt >= -0.5) & (rt <= bnd_r - 0.5)
            & (ct >= -0.5) & (ct <= bnd_c - 0.5)
            & (st >= -0.5) & (st <= n - 0.5)
        ).astype(jnp.float32)
        du_dts = -delta / (ts * ts)
        dtap_du = jnp.zeros_like(rows_raw)
        for off in range(-fwd_mod.SMOOTH_HALO, fwd_mod.SMOOTH_HALO + 1):
            d = u - off
            dker = jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)
            dtap_du = dtap_du + dker * d_rows[i + off + fwd_mod.SMOOTH_HALO]
        dtotal_dts = dtotal_dts + w * in_box * dtap_du * du_dts
        wsum = wsum + w * in_box
    return dtotal_dts / jnp.where(wsum > 0.0, wsum, 1.0)


def _replay_kernel(
    feat_ref,   # (1, 16, R)
    slice_ref,  # (sb, NR, NC)
    *rest,      # knobs_ref, [prev_ref, next_ref if smoothing]
                # [imp_ref if coloring|lookahead] [meta_ref if occupancy|win]
                # [grad_ref if shading] [ahead_ref if lookahead] lut_ref(B),
                # fin_all, gimg_all (C-resident), [dd_ref unless fused]
                # dlut_ref, dfeat_all (C-resident out), [dvol/dgrad if fused]
                # acc_all (C, 4, R) scratch, [dd scratch if fused]
    bilinear: bool,
    win_rows: int = 0,
    win_cols: int = 0,
    slab_batch: int = 1,
    march_sign: int = 1,
    occupancy: bool = False,
    coloring: bool = False,
    shading: bool = False,
    lookahead: bool = False,
    smoothing: bool = False,
    num_steps: int = 0,
    camera_grads: bool = True,
    inverted: bool = False,
    fuse_scatter: bool = False,
    aux=jax.lax.Precision.HIGHEST,
    subtexel: int = 0,
    stored_density: bool = False,
    stored_grads: bool = False,
    nr: int = 0,
    nc: int = 0,
    u8: bool = False,
    compact: bool = False,
):
    if compact:
        # compacted live-pair grid (fwd_mod.build_pairs): the prefetched
        # pair table replaces the 2-D grid; see fwd_mod._march_kernel
        pairs_ref, feat_ref = feat_ref, slice_ref
        rest = list(rest)
        slice_ref = rest.pop(0)
        rest = tuple(rest)
    if stored_density:
        # the second positional ref is the forward's per-step density
        # block (1, sb, 1, R) — the volume slice never enters the kernel
        # (nr/nc arrive statically for the hat shapes)
        dens_ref, slice_ref = slice_ref, None
    else:
        dens_ref = None
        nr, nc = slice_ref.shape[1], slice_ref.shape[2]
    rest = list(rest)
    # traced live-mutation knobs as SMEM scalars (see fwd_mod._march_kernel)
    knobs_ref = rest.pop(0)
    threshold = knobs_ref[0, 0]
    early_alpha = knobs_ref[0, 1]
    prev_ref = rest.pop(0) if smoothing and not stored_density else None
    next_ref = rest.pop(0) if smoothing and not stored_density else None
    imp_ref = rest.pop(0) if coloring else None
    meta_ref = rest.pop(0) if (occupancy or win_rows or win_cols) else None
    grad_ref = rest.pop(0) if shading and not stored_grads else None
    ahead_ref = rest.pop(0) if lookahead else None
    dvol_ref = dgrad_out_ref = None
    if fuse_scatter:
        # pass-2 fusion (inverted grid only): the d_volume (and
        # d_grad-field) slab blocks are indexed by the OUTER grid
        # axis, so they accumulate in VMEM across the consecutive
        # chunk revisits — the scatter reuses this step's hats
        # instead of a second kernel rebuilding them.  The per-step
        # cotangent block dd then has no consumer outside the kernel
        # and lives in scratch instead of an HBM output.
        (lut_ref, fin_all, gimg_all, dlut_ref, dfeat_all) = rest[:5]
        rest2 = rest[5:]
        dvol_ref = rest2.pop(0)
        if shading:
            dgrad_out_ref = rest2.pop(0)
        acc_all = rest2.pop(0)
        dd_ref = rest2.pop(0)
        assert not rest2
    else:
        lut_ref, fin_all, gimg_all, dd_ref, dlut_ref, dfeat_all, acc_all = rest
    if compact:
        i = pl.program_id(0)
        C, jb = pairs_ref[fwd_mod.P_C, i], pairs_ref[fwd_mod.P_J, i]
        pair_first_c = pairs_ref[fwd_mod.P_FIRST_C, i] > 0
        pair_first_b = pairs_ref[fwd_mod.P_FIRST_B, i] > 0
        pair_live = pairs_ref[fwd_mod.P_LIVE, i] > 0
    elif inverted:
        jb, C = pl.program_id(0), pl.program_id(1)
    else:
        C, jb = pl.program_id(0), pl.program_id(1)
    # Whole-array resident per-chunk state (see fwd_mod._march_kernel):
    # feats/fin/g_img fetched once per frame, the replay accumulator in a
    # (C, 4, R) VMEM scratch, and d_feats a resident output — no aliased
    # per-iteration HBM round trips.
    feat_ref = feat_ref.at[pl.ds(C, 1)]
    fin_ref = fin_all.at[pl.ds(C, 1)]
    gimg_ref = gimg_all.at[pl.ds(C, 1)]
    dfeat_ref = dfeat_all.at[pl.ds(C, 1)]
    acc_ref = acc_all.at[C]

    @pl.when(
        pl.program_id(0) == 0
        if compact
        else (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    )
    def _init_lut():
        dlut_ref[:] = jnp.zeros_like(dlut_ref)

    if fuse_scatter:
        # compacted: the block's first TAKEN pair zeroes its d_vol output
        # block — for a block with no live chunk that is its pad pair,
        # whose only job is exactly this init (build_pairs)
        @pl.when(pair_first_b if compact else pl.program_id(1) == 0)
        def _init_dvol():
            dvol_ref[:] = jnp.zeros_like(dvol_ref)
            if dgrad_out_ref is not None:
                dgrad_out_ref[:] = jnp.zeros_like(dgrad_out_ref)

    @pl.when(pair_first_c if compact else jb == 0)
    def _init_acc():
        acc_ref[:] = jnp.zeros_like(acc_ref[:])
        dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

    # same block-level empty-space gate as the forward
    # (fwd_mod._march_kernel): flags + window starts PRECOMPUTED once per
    # frame (fwd_mod.build_step_meta) and read as SMEM scalars; ONE branch
    # skips the whole batch (incl. the stencil prologue under smoothing);
    # per-step branches only run inside live blocks
    halo = fwd_mod.SMOOTH_HALO if (smoothing and win_rows) else 0
    occ_flags, block_occ, r0s, c0_b, fits_b = fwd_mod._read_step_meta(
        meta_ref, slab_batch, win_rows, halo, occupancy, win_cols
    )
    # same whole-chunk skip as the forward: with occupancy meta the
    # (chunk, batch) t-window/sign activity is already folded into
    # block_occ on the XLA side, leaving one nested lane reduce for the
    # dynamic saturation term (see the gate below); without meta the full
    # feats-based gate runs.  Skipped batches emit zero density-cotangents
    # either way via the dd pre-zero.
    if occupancy:
        chunk_active = block_occ
    else:
        feat0 = feat_ref[0]
        jf0 = (jb * slab_batch).astype(jnp.float32)
        t_now = feat0[F_TS : F_TS + 1, :] * jf0 + feat0[F_TB : F_TB + 1, :]
        t_last = t_now + feat0[F_TS : F_TS + 1, :] * jnp.float32(slab_batch - 1)
        can_contribute = (
            (acc_ref[3:4, :] < early_alpha)
            & (t_now < feat0[F_EXIT : F_EXIT + 1, :])
            & (t_last >= feat0[F_ENTRY : F_ENTRY + 1, :])
            & (feat0[F_SIGNOK : F_SIGNOK + 1, :] > 0.5)
        )
        chunk_active = jnp.any(can_contribute)
    if compact:
        # pad pairs alias a real (chunk, block)'s meta — their liveness
        # bit is the authority (see fwd_mod._march_kernel)
        chunk_active = chunk_active & pair_live

    # the dd block is written every iteration: pre-zero it once (cheap
    # vector store) so skipped batches/steps need no zeroing branches
    dd_ref[0] = jnp.zeros_like(dd_ref[0])

    def _active_block():
        feat = feat_ref[0]
        smooth_rows = dts_rows = None
        if smoothing and not stored_density:
            # mirror the forward's batch-amortised stencil (_march_kernel):
            # plain density rows for march offsets [-HALO, sb + HALO) from
            # the prev/cur/next blocks, then per-sub-step smoothed density
            # AND its d/dF_TS (the tap offsets u = delta/ts are the only
            # smooth-weight dependence on the feats that isn't a mask)
            jbv = jb

            def local_row(i):
                return i if march_sign > 0 else slab_batch - 1 - i

            def drow(block_ref, i_local, off):
                jf = (jbv * slab_batch + off).astype(jnp.float32)
                return fwd_mod._density_row(
                    block_ref, local_row(i_local), feat, jf,
                    bilinear=bilinear, win_rows=win_rows,
                    precision=jax.lax.Precision.HIGHEST,
                    r0=None if r0s is None else r0s[off + halo],
                    subtexel=subtexel,
                )

            d_cur = [drow(slice_ref, i, i) for i in range(slab_batch)]
            d_next = []
            for h in range(fwd_mod.SMOOTH_HALO):
                off = slab_batch + h
                jj = jbv * slab_batch + off
                cand = drow(next_ref, h, off)
                d_next.append(
                    jnp.where(jj <= num_steps - 1, cand, d_cur[slab_batch - 1])
                )
            d_prev = []
            for h in range(fwd_mod.SMOOTH_HALO):
                off = -fwd_mod.SMOOTH_HALO + h
                jj = jbv * slab_batch + off
                cand = drow(prev_ref, slab_batch + off, off)
                d_prev.append(jnp.where(jj >= 0, cand, d_cur[0]))
            d_rows = d_prev + d_cur + d_next
            nr_s, nc_s = slice_ref.shape[1], slice_ref.shape[2]
            smooth_rows = [
                fwd_mod._smooth_row(
                    feat, (jbv * slab_batch + i).astype(jnp.float32), d_rows,
                    i, num_steps, bilinear, nr=nr_s, nc=nc_s,
                )
                for i in range(slab_batch)
            ]
            if camera_grads:
                dts_rows = [
                    _smooth_row_dts(
                        feat, (jbv * slab_batch + i).astype(jnp.float32),
                        d_rows, i, num_steps, bilinear, nr=nr_s, nc=nc_s,
                    )
                    for i in range(slab_batch)
                ]
        def steps(win_c, c0):
            for i in range(slab_batch):
                _replay_step(
                    feat_ref, slice_ref, lut_ref, fin_ref, gimg_ref, dd_ref,
                    dlut_ref, dfeat_ref, acc_ref,
                    j=jb * slab_batch + i,
                    dd_row=i,
                    slice_row=i if march_sign > 0 else slab_batch - 1 - i,
                    bilinear=bilinear, early_alpha=early_alpha,
                    threshold=threshold, win_rows=win_rows, win_cols=win_c,
                    imp_ref=imp_ref, grad_ref=grad_ref, coloring=coloring,
                    ahead=ahead_ref[0, i] if lookahead else None,
                    density_override=(
                        dens_ref[0, i, 0:1] if stored_density
                        else (None if smooth_rows is None else smooth_rows[i])
                    ),
                    g_override=(
                        dens_ref[0, i, 1:4] if stored_grads else None
                    ),
                    dsmooth_dts=None if dts_rows is None else dts_rows[i],
                    camera_grads=camera_grads,
                    occupied=None if occ_flags is None else occ_flags[i],
                    r0=None if r0s is None else r0s[i + halo],
                    c0=c0,
                    dvol_ref=dvol_ref,
                    dgrad_out_ref=dgrad_out_ref,
                    aux=aux,
                    subtexel=subtexel,
                    nr=nr,
                    nc=nc,
                    u8=u8,
                )

        if win_cols and fits_b is not None:
            # one column-window branch per slab batch (fwd_mod._march_kernel)
            @pl.when(fits_b)
            def _win_steps():
                steps(win_cols, c0_b)

            @pl.when(jnp.logical_not(fits_b))
            def _full_steps():
                steps(0, None)
        else:
            steps(0, None)

    if occupancy:
        # nested gates, as in the forward: empty blocks take one scalar
        # branch; live blocks pay one lane reduce for the saturation term
        @pl.when(chunk_active)
        def _occupied():
            @pl.when(jnp.any(acc_ref[3:4, :] < early_alpha))
            def _unsaturated():
                _active_block()
    else:
        @pl.when(chunk_active)
        def _active():
            _active_block()


def _replay_step(
    feat_ref, slice_ref, lut_ref, fin_ref, gimg_ref, dd_ref, dlut_ref,
    dfeat_ref, acc_ref,
    *, j, dd_row, slice_row, bilinear, early_alpha, threshold, win_rows=0,
    win_cols=0, imp_ref=None, grad_ref=None, coloring=False, ahead=None,
    density_override=None, g_override=None, dsmooth_dts=None,
    camera_grads=True, occupied=None, r0=None, c0=None, dvol_ref=None,
    dgrad_out_ref=None,
    aux=jax.lax.Precision.HIGHEST, subtexel=0, nr=None, nc=None, u8=False,
):
    jf = j.astype(jnp.float32) if hasattr(j, "astype") else jnp.float32(j)
    feat = feat_ref[0]
    if slice_ref is not None:
        nr, nc = slice_ref.shape[1], slice_ref.shape[2]
    rows_c, cols_c, t = _coords(feat, jf, nr, nc, subtexel)

    def body():
        _replay_step_body(
            feat, jf, rows_c, cols_c, t, slice_ref, lut_ref, fin_ref, gimg_ref,
            dd_ref, dlut_ref, dfeat_ref, acc_ref, dd_row=dd_row,
            slice_row=slice_row, bilinear=bilinear, early_alpha=early_alpha,
            threshold=threshold, win_rows=win_rows, imp_ref=imp_ref,
            grad_ref=grad_ref, coloring=coloring, ahead=ahead,
            density_override=density_override, g_override=g_override,
            dsmooth_dts=dsmooth_dts,
            camera_grads=camera_grads, r0=r0, dvol_ref=dvol_ref,
            dgrad_out_ref=dgrad_out_ref, win_cols=win_cols, c0=c0, aux=aux,
            subtexel=subtexel, nr=nr, nc=nc, u8=u8,
        )

    if occupied is None:
        body()
    else:
        # an empty-footprint step (precomputed flag, fwd_mod.build_step_meta)
        # contributes nothing: the dd block was pre-zeroed by the caller,
        # so skipping is a no-op
        @pl.when(occupied)
        def _do():
            body()


def _replay_step_body(
    feat, jf, rows_c, cols_c, t, slice_ref, lut_ref, fin_ref, gimg_ref, dd_ref,
    dlut_ref, dfeat_ref, acc_ref,
    *, dd_row, slice_row, bilinear, early_alpha, threshold, win_rows=0,
    win_cols=0, imp_ref=None, grad_ref=None, coloring=False, ahead=None,
    density_override=None, g_override=None, dsmooth_dts=None,
    camera_grads=True, r0=None,
    c0=None, dvol_ref=None, dgrad_out_ref=None,
    aux=jax.lax.Precision.HIGHEST, subtexel=0, nr=None, nc=None, u8=False,
):
    if slice_ref is not None:
        nr, nc = slice_ref.shape[1], slice_ref.shape[2]
    rays = feat.shape[-1]
    # hat exactness for the 2-pass contraction (fwd_mod.kernel_dot exact=):
    # box hats and dhat sign patterns always; snapped triangle hats too.
    # vol_hint marks a SECOND-operand hat (sampling contractions);
    # scat_hint a FIRST-operand hat (the fused scatters) — the hint names
    # the operand, and a wrong side silently rounds the other one to bf16
    vol_hint = "b" if (subtexel or not bilinear) else None
    scat_hint = "a" if (subtexel or not bilinear) else None
    if win_cols:
        assert c0 is not None, "column-windowed sampling needs a c0"
        cw = pl.ds(c0, win_cols)
        nx, cbase = win_cols, c0
    else:
        cw = slice(None)
        nx, cbase = nc, None

    if win_rows:
        assert r0 is not None, "windowed sampling needs a precomputed r0"
        hat_y = _hat(rows_c, win_rows, rays, bilinear, base=r0)
        dhat_y = (
            _dhat(rows_c, win_rows, rays, bilinear, base=r0)
            if camera_grads else None
        )
    else:
        hat_y = _hat(rows_c, nr, rays, bilinear)
        dhat_y = _dhat(rows_c, nr, rays, bilinear) if camera_grads else None
    hat_x = _hat(cols_c, nx, rays, bilinear, base=cbase)
    if density_override is None:
        if win_rows:
            sl = slice_ref[slice_row, pl.ds(r0, win_rows), cw]
        else:
            sl = slice_ref[slice_row, :, cw]
        colvals = fwd_mod.kernel_dot(
            sl, hat_y, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, exact=vol_hint,
        )
        density = jnp.sum(colvals * hat_x, axis=0, keepdims=True)  # (1, R)
    else:
        # Gaussian smoothing pre-computed the smoothed density (and its
        # d/dF_TS) per block, or the stored-density replay loaded the
        # forward's own sample — either way the volume slice is not read
        density = density_override

    shaded = (grad_ref is not None) or (g_override is not None)
    if g_override is not None:
        # shaded stored residual (stored_grads): the forward's own
        # gradient-field samples ride the width-4 density block — neither
        # the volume nor the gradient field is streamed, and the samples
        # are bit-identical to a re-contraction by construction
        gx = g_override[0:1, :]
        gy = g_override[1:2, :]
        gz = g_override[2:3, :]
        g_sq = gx * gx + gy * gy + gz * gz
        g_nonzero = g_sq > 0.0
        inv_norm = jax.lax.rsqrt(jnp.where(g_nonzero, g_sq, 1.0))
        n_x, n_y, n_z = gx * inv_norm, gy * inv_norm, gz * inv_norm
    elif grad_ref is not None:
        # shaded replay: re-sample the precomputed gradient field with the
        # same hats (forward: slab_kernel._march_step_body shading branch)
        g_colvals = []
        g_samp = []
        for ch in range(3):
            if win_rows:
                gsl = grad_ref[ch, slice_row, pl.ds(r0, win_rows), cw]
            else:
                gsl = grad_ref[ch, slice_row, :, cw]
            cv = fwd_mod.kernel_dot(
                gsl, hat_y, (((0,), (0,)), ((), ())),
                precision=aux, exact=vol_hint,
            )
            g_colvals.append(cv)
            g_samp.append(jnp.sum(cv * hat_x, axis=0, keepdims=True))
        gx, gy, gz = g_samp
        g_sq = gx * gx + gy * gy + gz * gz
        g_nonzero = g_sq > 0.0
        inv_norm = jax.lax.rsqrt(jnp.where(g_nonzero, g_sq, 1.0))
        n_x, n_y, n_z = gx * inv_norm, gy * inv_norm, gz * inv_norm

    if imp_ref is not None:
        # box-filtered importance sample: the coloring rgba source and/or
        # the look-ahead gate (both nearest-filtered, importance.rs:122-131)
        bhx = _hat(cols_c, nx, rays, False, base=cbase)
        if win_rows:
            bhy = _hat(rows_c, win_rows, rays, False, base=r0)
            isl = imp_ref[slice_row, pl.ds(r0, win_rows), cw]
        else:
            bhy = _hat(rows_c, nr, rays, False)
            isl = imp_ref[slice_row, :, cw]
        icolvals = fwd_mod.kernel_dot(
            isl, bhy, (((0,), (0,)), ((), ())),
            precision=aux, exact="b",
        )
        imp = jnp.sum(icolvals * bhx, axis=0, keepdims=True)  # (1, R)
    if coloring:
        rgba = jnp.concatenate(
            [
                jnp.minimum(imp * 1.5, 1.0),
                (1.0 - imp) * 1.2,
                jnp.full_like(imp, 0.2),
                imp,
            ],
            axis=0,
        )
    else:
        b = lut_ref[:]  # grouped LUT (4G, NI) — see slab_kernel.lut_groups
        n_groups = b.shape[0] // 4
        rgba, onehot, diff, tri_o, tf_c_raw, ln = fwd_mod._tf_lookup(
            b, density, rays, dscale=(1.0 / 255.0) if u8 else None
        )
        tf_in_range = (tf_c_raw > 0.0) & (tf_c_raw < ln - 1.0)  # clip grad mask

    rgb_comp = rgba[:3, :]
    if shaded:
        # Blinn-Phong forward (wgsl:190-211; mirrors the fwd kernel exactly)
        from volym_tpu.render.shading import AMBIENT, DIFFUSE, SHININESS, SPECULAR

        inv_sqrt3 = 0.57735026
        s_diff = (n_x + n_y + n_z) * inv_sqrt3
        diffuse = jnp.maximum(0.0, s_diff)
        h_x = feat[F_HX : F_HX + 1, :]
        h_y = feat[F_HY : F_HY + 1, :]
        h_z = feat[F_HZ : F_HZ + 1, :]
        hdotn = h_x * n_x + h_y * n_y + h_z * n_z
        spec_base = jnp.maximum(0.0, hdotn)
        spec = spec_base ** SHININESS
        shade_f = AMBIENT + DIFFUSE * diffuse
        rgb_comp = jnp.where(
            g_nonzero, rgb_comp * shade_f + SPECULAR * spec, rgb_comp
        )

    acc = acc_ref[:]
    acc_a = acc[3:4, :]
    valid = (
        (feat[F_SIGNOK : F_SIGNOK + 1, :] > 0.5)
        & (t >= feat[F_ENTRY : F_ENTRY + 1, :])
        & (t < feat[F_EXIT : F_EXIT + 1, :])
    )
    m = valid & (density >= threshold) & (acc_a < early_alpha)
    if ahead is not None:
        # skip-if-important-ahead (wgsl:286-296): the pre-pass's COMBINED
        # gate bit (see lookahead_kernel) — pure comparisons, zero
        # gradient, no importance sampling in the replay
        m = m & jnp.logical_not(ahead > 0.5)
    mf = m.astype(jnp.float32)

    a = rgba[3:4, :]
    aexp = feat[F_AEXP : F_AEXP + 1, :]
    log1ma = jnp.log(jnp.maximum(1.0 - a, _LOG_FLOOR))
    alpha = 1.0 - jnp.exp(aexp * log1ma)
    beta = alpha * mf
    t_k = 1.0 - acc_a
    w = t_k * beta

    g = gimg_ref[0]        # (4, R) upstream image cotangent
    g_c, g_a = g[:3, :], g[3:4, :]
    fin = fin_ref[0]
    fin_c, fin_a = fin[:3, :], fin[3:4, :]

    new_acc_c = acc[:3, :] + rgb_comp * w
    new_acc_a = acc_a + w
    acc_ref[:3, :] = new_acc_c
    acc_ref[3:4, :] = new_acc_a

    suf_c = fin_c - new_acc_c
    suf_a = fin_a - new_acc_a

    d_rgb = g_c * w  # (3, R) — cotangent on the COMPOSITED rgb
    inv = 1.0 / jnp.maximum(1.0 - beta, _EPS)
    d_beta = (
        t_k * (jnp.sum(g_c * rgb_comp, axis=0, keepdims=True) + g_a)
        - (jnp.sum(g_c * suf_c, axis=0, keepdims=True) + g_a * suf_a) * inv
    )
    d_alpha = d_beta * mf
    # d alpha / d a = aexp * (1-a)^(aexp-1)
    d_a = d_alpha * aexp * jnp.exp((aexp - 1.0) * log1ma)

    if shaded:
        # chain the shading: rgb_comp = nonzero ? tf_rgb*shade_f + S*spec
        #                                       : tf_rgb
        from volym_tpu.render.shading import DIFFUSE, SHININESS, SPECULAR

        nzf = g_nonzero.astype(jnp.float32)
        d_rgb_tf = d_rgb * jnp.where(g_nonzero, shade_f, 1.0)
        d_diffuse = (
            jnp.sum(d_rgb * rgba[:3, :], axis=0, keepdims=True) * DIFFUSE * nzf
        )
        d_spec = jnp.sum(d_rgb, axis=0, keepdims=True) * SPECULAR * nzf
        d_hdotn = jnp.where(
            hdotn > 0.0,
            d_spec * SHININESS * spec_base ** (SHININESS - 1.0),
            0.0,
        )
        d_sdiff = jnp.where(s_diff > 0.0, d_diffuse, 0.0)
        d_nx = d_sdiff * inv_sqrt3 + d_hdotn * h_x
        d_ny = d_sdiff * inv_sqrt3 + d_hdotn * h_y
        d_nz = d_sdiff * inv_sqrt3 + d_hdotn * h_z
        # n = g * rsqrt(|g|^2): dn/dg = inv_norm * (I - n n^T)
        n_dot_dn = n_x * d_nx + n_y * d_ny + n_z * d_nz
        d_gx = inv_norm * (d_nx - n_x * n_dot_dn) * nzf
        d_gy = inv_norm * (d_ny - n_y * n_dot_dn) * nzf
        d_gz = inv_norm * (d_nz - n_z * n_dot_dn) * nzf
        # half-vector cotangents (-> camera dirs via _pack_features)
        d_half_x = d_hdotn * n_x
        d_half_y = d_hdotn * n_y
        d_half_z = d_hdotn * n_z
        d_rgb = d_rgb_tf

    d_rgba = jnp.concatenate([d_rgb, d_a], axis=0)  # (4, R)

    if coloring:
        # importance cotangent: rgba = (min(1.5i, 1), 1.2(1-i), .2, i)
        dd = (
            d_rgba[0:1, :] * jnp.where(imp * 1.5 < 1.0, 1.5, 0.0)
            - d_rgba[1:2, :] * 1.2
            + d_rgba[3:4, :]
        )
        if shaded:
            # coloring+shading combined: row 0 carries d_imp (box-hat
            # scatter into the importance grid), rows 1..3 the
            # gradient-field channel cotangents
            dd_ref[0, dd_row] = jnp.concatenate([dd, d_gx, d_gy, d_gz], axis=0)
        else:
            dd_ref[0, dd_row] = dd

        if dvol_ref is not None:
            # fused pass 2 (inverted grid): d_imp scatters with the BOX
            # hats of the importance sample; the gradient-field channels
            # (combined mode) with the bilinear hats.  The scatter runs at
            # FULL lane width even under the column window — a dynamic-
            # lane-offset read-modify-write on the VMEM accumulator is
            # slower than the halved matmul saves (measured +7ms/frame at
            # 256²); the windowed SAMPLING above is where the win is.
            w_sl = pl.ds(r0, win_rows) if win_rows else slice(None)
            bhx_s = (
                _hat(cols_c, nc, rays, False) if win_cols else bhx
            )
            dvol_ref[slice_row, w_sl, :] = dvol_ref[
                slice_row, w_sl, :
            ] + fwd_mod.kernel_dot(
                bhy, bhx_s * dd, (((1,), (1,)), ((), ())),
                precision=aux, exact="a",
            )
            if dgrad_out_ref is not None:
                hat_x_s = (
                    _hat(cols_c, nc, rays, bilinear) if win_cols else hat_x
                )
                for ch, dg in enumerate((d_gx, d_gy, d_gz)):
                    dgrad_out_ref[ch, slice_row, w_sl, :] = dgrad_out_ref[
                        ch, slice_row, w_sl, :
                    ] + fwd_mod.kernel_dot(
                        hat_y, hat_x_s * dg, (((1,), (1,)), ((), ())),
                        precision=aux, exact=scat_hint,
                    )
    else:
        # grouped-LUT gradient: dB[(ch,g), i] += onehot[g,r] d_rgba[ch,r] tri_o[i,r]
        # (folded back onto the LUT by fold_lut_groups_grad in backward())
        p = jnp.concatenate(
            [onehot * d_rgba[ch : ch + 1, :] for ch in range(4)], axis=0
        )  # (4G, R)
        dlut_ref[:] = dlut_ref[:] + fwd_mod.kernel_dot(
            p, tri_o, (((1,), (1,)), ((), ())),
            precision=aux,
        )

        # density cotangent through the TF hat: d tri/d tf_c = -sign(diff)
        # where |diff| < 1 (diff is the within-group offset minus the entry
        # index; d offset/d tf_c = 1)
        dtri_o = jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0)
        zd = fwd_mod.kernel_dot(
            b, dtri_o, (((1,), (0,)), ((), ())),
            precision=aux, exact="b",
        )  # (4G, R)
        drgba_dc = jnp.concatenate(
            [
                jnp.sum(
                    onehot * zd[ch * n_groups : (ch + 1) * n_groups],
                    axis=0,
                    keepdims=True,
                )
                for ch in range(4)
            ],
            axis=0,
        )  # (4, R)
        d_tf_c = jnp.sum(d_rgba * drgba_dc, axis=0, keepdims=True)  # (1, R)
        # u8 mode: density is in the scaled 0..255 domain, so the TF
        # coordinate derivative carries the ln/255 factor (matching the
        # forward's dscale) — dd is then d/d(scaled density); the caller
        # rescales the final scatter by 255 back to the v/255 volume
        dd = d_tf_c * (float(ln) * ((1.0 / 255.0) if u8 else 1.0))
        dd = dd * tf_in_range.astype(jnp.float32)
        if shaded:
            # rows 0..3: density cotangent + the 3 gradient-field channel
            # cotangents (scattered by _voxel_grad_shaded_kernel)
            dd_ref[0, dd_row] = jnp.concatenate([dd, d_gx, d_gy, d_gz], axis=0)
        else:
            dd_ref[0, dd_row] = dd

        if dvol_ref is not None:
            # fused pass 2 (inverted grid): scatter the step cotangents
            # into the VMEM-resident slab blocks with THIS step's hats —
            # the separate voxel-grad kernel would rebuild them.  Full
            # lane width even under the column window (see the coloring
            # scatter above): dynamic-lane-offset VMEM read-modify-write
            # costs more than the halved matmul saves.
            w_sl = pl.ds(r0, win_rows) if win_rows else slice(None)
            hat_x_s = _hat(cols_c, nc, rays, bilinear) if win_cols else hat_x

            def _outer(row):
                return fwd_mod.kernel_dot(
                    hat_y, hat_x_s * row, (((1,), (1,)), ((), ())),
                    precision=aux, exact=scat_hint,
                )

            dvol_ref[slice_row, w_sl, :] = dvol_ref[
                slice_row, w_sl, :
            ] + _outer(dd)
            if dgrad_out_ref is not None:
                for ch, dg in enumerate((d_gx, d_gy, d_gz)):
                    dgrad_out_ref[ch, slice_row, w_sl, :] = dgrad_out_ref[
                        ch, slice_row, w_sl, :
                    ] + _outer(dg)

    # --- camera cotangents: accumulate dL/dfeats rows ------------------
    # density depends on (rows_c, cols_c) through the hats (one extra
    # dhat_y matmul; the cols derivative reuses colvals); alpha depends on
    # aexp.  t/entry/exit/signok appear only in masks (zero a.e.).  The
    # feats -> camera chain is jnp (_pack_features) and autodiffs outside.
    zero = jnp.zeros_like(dd)
    if dhat_y is not None and (not coloring or grad_ref is not None):
        from volym_tpu.ops.slab_kernel import F_CB, F_CS, F_RB, F_RS

        dhat_x = _dhat(cols_c, nx, rays, True, base=cbase)
        rows_raw = feat[F_RS : F_RS + 1, :] * jf + feat[F_RB : F_RB + 1, :]
        cols_raw = feat[F_CS : F_CS + 1, :] * jf + feat[F_CB : F_CB + 1, :]
        rows_in = ((rows_raw > 0.0) & (rows_raw < nr - 1.0)).astype(jnp.float32)
        cols_in = ((cols_raw > 0.0) & (cols_raw < nc - 1.0)).astype(jnp.float32)
        if density_override is None and not coloring:
            # (under coloring, dd is the importance cotangent and the
            # box-hat imp sample has zero rows/cols derivative a.e. —
            # only the bilinear gradient-field chain below contributes)
            colvals_dy = fwd_mod.kernel_dot(
                sl, dhat_y, (((0,), (0,)), ((), ())),
                precision=aux, exact="b",
            )
            ddens_drows = jnp.sum(colvals_dy * hat_x, axis=0, keepdims=True)
            ddens_dcols = jnp.sum(colvals * dhat_x, axis=0, keepdims=True)
            d_rows = dd * ddens_drows * rows_in
            d_cols = dd * ddens_dcols * cols_in
        else:
            # smoothed density: each plain row's hats chain runs in pass 2b
            # (the cotangent of plain row k mixes FUTURE steps' dd)
            d_rows = d_cols = zero
        if grad_ref is not None:
            # the gradient-field samples also ride (rows_c, cols_c): one
            # extra dhat_y matmul per channel (dhat_x reuses g_colvals)
            d_gs = (d_gx, d_gy, d_gz)
            for ch in range(3):
                if win_rows:
                    gsl = grad_ref[ch, slice_row, pl.ds(r0, win_rows), cw]
                else:
                    gsl = grad_ref[ch, slice_row, :, cw]
                g_cv_dy = fwd_mod.kernel_dot(
                    gsl, dhat_y, (((0,), (0,)), ((), ())),
                    precision=aux, exact="b",
                )
                dg_drows = jnp.sum(g_cv_dy * hat_x, axis=0, keepdims=True)
                dg_dcols = jnp.sum(g_colvals[ch] * dhat_x, axis=0, keepdims=True)
                d_rows = d_rows + d_gs[ch] * dg_drows * rows_in
                d_cols = d_cols + d_gs[ch] * dg_dcols * cols_in
    else:
        d_rows = d_cols = zero
    if not camera_grads:
        # scene-only fitting: d feats stays zero (see RenderParams.camera_grads)
        return
    # d alpha / d aexp = -log1ma * exp(aexp * log1ma) = log1ma * (alpha-1)
    d_aexp = d_alpha * log1ma * (alpha - 1.0)
    if shaded:
        dh_x, dh_y, dh_z = d_half_x, d_half_y, d_half_z
    else:
        dh_x = dh_y = dh_z = zero
    # F_TS carries the Gaussian-smoothing tap-offset chain (u = delta/ts);
    # otherwise ts/tb appear only in masks (zero gradient a.e.)
    d_ts = dd * dsmooth_dts if dsmooth_dts is not None else zero
    if coloring and dsmooth_dts is not None:
        d_ts = zero  # coloring ignores density; no TF chain to the taps
    delta = jnp.concatenate(
        [
            d_rows * jf, d_rows,          # F_RS, F_RB
            d_cols * jf, d_cols,          # F_CS, F_CB
            d_ts, zero,                   # F_TS, F_TB
            zero, zero,                   # F_ENTRY, F_EXIT
            d_aexp, zero,                 # F_AEXP, F_SIGNOK
            dh_x, dh_y, dh_z,             # F_HX..F_HZ (Blinn-Phong half)
            zero, zero, zero,             # F_CD, F_C2, pad
        ],
        axis=0,
    )  # (16, R)
    dfeat_ref[0] = dfeat_ref[0] + delta


def _smooth_dd_transpose(feats, dd, n_slabs, bilinear, nr=None, nc=None):
    """(C, M, 1, R) smoothed-density cotangent -> plain-row cotangent.

    Transpose of the slab-axis Gaussian stencil (``slab_kernel._smooth_row``,
    jnp spec ``render/slab.py:smoothed_densities``): plain density row k
    accumulates ``c_off(j) * dd_smooth[j]`` for every (j, off) with
    ``clamp(j + off) == k`` — the forward clamps out-of-sweep halo rows to
    the sweep ends, so the edge rows collect the clamped taps.  Pure
    elementwise jnp on the feats (runs between the replay and pass 2);
    the (M, R) arrays are march-ordered like ``dd``.
    """
    import math as _math

    from volym_tpu.render.golden import (
        GAUSSIAN_KERNEL_SIZE,
        GAUSSIAN_SIGMA,
        GAUSSIAN_STEP,
    )

    c, m, _, r = dd.shape
    ts = feats[:, F_TS, :][:, None, :]  # (C, 1, R)
    rs = feats[:, F_RS, :][:, None, :]
    cs = feats[:, F_CS, :][:, None, :]
    rb = feats[:, F_RB, :][:, None, :]
    cb = feats[:, F_CB, :][:, None, :]
    jf = jnp.arange(m, dtype=jnp.float32)[None, :, None]  # (1, M, 1)
    rows_raw = rs * jf + rb  # (C, M, R)
    cols_raw = cs * jf + cb
    # bounds: the slab axis runs over the n_slabs MARCH planes, but the
    # in-plane tap coordinates live in texel space (nr/nc rows/cols) —
    # under the step-size plane mapping (slab.resolve_planes) these
    # differ, and bounding rt/ct with n_slabs masked most taps out
    # whenever planes < nr (wrong d_volume; caught by code review +
    # test_smoothing_backward_subsampled_planes)
    n = jnp.float32(n_slabs)
    bnd_r = jnp.float32(n_slabs if nr is None else nr)
    bnd_c = jnp.float32(n_slabs if nc is None else nc)

    taps = []
    wsum = jnp.zeros((c, m, r), jnp.float32)
    for tap in range(-GAUSSIAN_KERNEL_SIZE, GAUSSIAN_KERNEL_SIZE + 1):
        delta = tap * GAUSSIAN_STEP
        w = _math.exp(-(delta * delta) / (2.0 * GAUSSIAN_SIGMA * GAUSSIAN_SIGMA))
        u = delta / jnp.where(ts == 0.0, 1.0, ts)  # padded-lane guard (see fwd _smooth_row)  # (C, 1, R)
        rt = rows_raw + u * rs
        ct = cols_raw + u * cs
        st = jf + u
        in_box = (
            (rt >= -0.5) & (rt <= bnd_r - 0.5)
            & (ct >= -0.5) & (ct <= bnd_c - 0.5)
            & (st >= -0.5) & (st <= n - 0.5)
        ).astype(jnp.float32)
        taps.append((w, u, in_box))
        wsum = wsum + w * in_box
    wsum = jnp.where(wsum > 0.0, wsum, 1.0)

    dd2 = dd[:, :, 0, :]  # (C, M, R)
    out = jnp.zeros_like(dd2)
    idx = jnp.arange(m)
    for off in range(-fwd_mod.SMOOTH_HALO, fwd_mod.SMOOTH_HALO + 1):
        coeff = jnp.zeros((c, m, r), jnp.float32)
        for w, u, in_box in taps:
            d = u - off
            if bilinear:
                ker = jnp.maximum(0.0, 1.0 - jnp.abs(d))
            else:
                ker = ((d >= -0.5) & (d < 0.5)).astype(jnp.float32)
            coeff = coeff + (w * ker) * in_box
        tgt = jnp.clip(idx + off, 0, m - 1)
        out = out.at[:, tgt, :].add(coeff / wsum * dd2)
    return out[:, :, None, :]


def _feats_grad_kernel(
    feat_ref,   # (1, 16, R)
    slice_ref,  # (sb, NR, NC) volume slices for this march block
    dd_ref,     # (1, sb, 1, R) PLAIN-row density cotangent (march order)
    *rest,      # [meta_ref if win] [dfeat_in_ref if inverted] dfeat_ref (out)
    bilinear: bool,
    win_rows: int = 0,
    slab_batch: int = 1,
    march_sign: int = 1,
    inverted: bool = False,
    halo: int = 0,
    aux=jax.lax.Precision.HIGHEST,
    subtexel: int = 0,
):
    """Pass 2b (Gaussian smoothing only): the rows/cols camera chain of the
    plain density rows.  In the unsmoothed replay this chain is fused into
    pass 1, but a smoothed step's density mixes FUTURE steps' plain rows,
    so the plain-row cotangent only exists after the full replay + stencil
    transpose; this kernel re-derives each row's bilinear-hat derivative
    (one dhat_y matmul + one hat_y matmul per step) and accumulates the
    F_RS/F_RB/F_CS/F_CB rows of d_feats."""
    rest = list(rest)
    meta_ref = rest.pop(0) if win_rows else None
    if inverted:
        dfeat_in_ref, dfeat_ref = rest
        jb = pl.program_id(0)
        dfeat_ref[0] = dfeat_in_ref[0]
    else:
        (dfeat_ref,) = rest
        jb = pl.program_id(1)

        @pl.when(jb == 0)
        def _init():
            dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

    feat = feat_ref[0]
    nr, nc = slice_ref.shape[1], slice_ref.shape[2]
    rays = feat.shape[-1]

    nzv = jnp.any(
        jnp.any(dd_ref[0] != 0.0, axis=2, keepdims=True), axis=1, keepdims=True
    )  # (sb, 1, 1)
    # Mosaic can only squeeze 32-bit elements to scalars: extract via int32
    nzi = nzv.astype(jnp.int32)
    flags = [nzi[i, 0, 0] > 0 for i in range(slab_batch)]
    block_nz = jnp.max(nzi) > 0
    _, _, r0s, _, _ = fwd_mod._read_step_meta(meta_ref, slab_batch, win_rows, halo, False)

    @pl.when(block_nz)
    def _block():
        for i in range(slab_batch):
            j = jb * slab_batch + i
            slice_row = i if march_sign > 0 else slab_batch - 1 - i
            dd = dd_ref[0, i]  # (1, R)
            jf = j.astype(jnp.float32) if hasattr(j, "astype") else jnp.float32(j)

            @pl.when(flags[i])
            def _accumulate(jf=jf, dd=dd, slice_row=slice_row, i=i):
                rows_c, cols_c, t = _coords(feat, jf, nr, nc, subtexel)
                hat_x = _hat(cols_c, nc, rays, bilinear)
                dhat_x = _dhat(cols_c, nc, rays, bilinear)
                if win_rows:
                    r0 = r0s[i + halo]
                    hat_y = _hat(rows_c, win_rows, rays, bilinear, base=r0)
                    dhat_y = _dhat(rows_c, win_rows, rays, bilinear, base=r0)
                    sl = slice_ref[slice_row, pl.ds(r0, win_rows), :]
                else:
                    hat_y = _hat(rows_c, nr, rays, bilinear)
                    dhat_y = _dhat(rows_c, nr, rays, bilinear)
                    sl = slice_ref[slice_row]
                colvals = fwd_mod.kernel_dot(
                    sl, hat_y, (((0,), (0,)), ((), ())),
                    precision=aux,
                    exact="b" if (subtexel or not bilinear) else None,
                )
                colvals_dy = fwd_mod.kernel_dot(
                    sl, dhat_y, (((0,), (0,)), ((), ())),
                    precision=aux, exact="b",
                )
                ddens_drows = jnp.sum(colvals_dy * hat_x, axis=0, keepdims=True)
                ddens_dcols = jnp.sum(colvals * dhat_x, axis=0, keepdims=True)
                rows_raw = feat[F_RS : F_RS + 1, :] * jf + feat[F_RB : F_RB + 1, :]
                cols_raw = feat[F_CS : F_CS + 1, :] * jf + feat[F_CB : F_CB + 1, :]
                rows_in = ((rows_raw > 0.0) & (rows_raw < nr - 1.0)).astype(jnp.float32)
                cols_in = ((cols_raw > 0.0) & (cols_raw < nc - 1.0)).astype(jnp.float32)
                d_rows = dd * ddens_drows * rows_in
                d_cols = dd * ddens_dcols * cols_in
                zero = jnp.zeros_like(dd)
                delta = jnp.concatenate(
                    [d_rows * jf, d_rows, d_cols * jf, d_cols]
                    + [zero] * (N_FEATURES - 4),
                    axis=0,
                )
                dfeat_ref[0] = dfeat_ref[0] + delta


def _run_feats_grad(feats, vol_perm, dd, *, bilinear, win_rows, sb, sign, aux=jax.lax.Precision.HIGHEST, subtexel=0):
    """Driver for pass 2b (:func:`_feats_grad_kernel`): slab-outer inverted
    grid with an aliased d_feats accumulator when the chunk count allows
    (see ``fwd_mod.INVERT_MIN_CHUNKS``)."""
    n_chunks = feats.shape[0]
    n_slabs, nr, nc = vol_perm.shape
    n_blocks = n_slabs // sb
    inverted = n_chunks >= fwd_mod.INVERT_MIN_CHUNKS
    W = (lambda f: (lambda j, c: f(c, j))) if inverted else (lambda f: f)
    slab_index = W(
        (lambda c, j: (j, 0, 0)) if sign > 0 else (
            lambda c, j: (n_blocks - 1 - j, 0, 0)
        )
    )
    fg = partial(
        _feats_grad_kernel, bilinear=bilinear, win_rows=win_rows,
        slab_batch=sb, march_sign=sign, inverted=inverted,
        halo=fwd_mod.SMOOTH_HALO, aux=aux, subtexel=subtexel,
    )
    in_specs = [
        pl.BlockSpec((1, N_FEATURES, RAYS_PER_CHUNK), W(lambda c, j: (c, 0, 0))),
        pl.BlockSpec((sb, nr, nc), slab_index),
        pl.BlockSpec((1, sb, 1, RAYS_PER_CHUNK), W(lambda c, j: (c, j, 0, 0))),
    ]
    inputs = [feats, vol_perm, dd]
    if win_rows:
        meta = fwd_mod.build_step_meta(
            feats, None, n_slabs=n_slabs, sb=sb, sign=sign, nr=nr, nc=nc,
            margin=1.0, win_rows=win_rows, halo=fwd_mod.SMOOTH_HALO,
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, meta.shape[3]), W(lambda c, j: (c, j, 0, 0)),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(meta)
    aliases = {}
    if inverted:
        in_specs.append(
            pl.BlockSpec((1, N_FEATURES, RAYS_PER_CHUNK), W(lambda c, j: (c, 0, 0)))
        )
        inputs.append(jnp.zeros((n_chunks, N_FEATURES, RAYS_PER_CHUNK), jnp.float32))
        aliases = {len(inputs) - 1: 0}
    return pl.pallas_call(
        fg,
        grid=(n_blocks, n_chunks) if inverted else (n_chunks, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, N_FEATURES, RAYS_PER_CHUNK), W(lambda c, j: (c, 0, 0))
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, N_FEATURES, RAYS_PER_CHUNK), jnp.float32
        ),
        input_output_aliases=aliases,
        # streams full (sb, nr, nc) volume slices like the replay —
        # budget them or 512^3 smoothed camera grads OOM scoped vmem
        compiler_params=fwd_mod.vmem_params(
            False, slice_bytes=vol_perm.shape[1] * vol_perm.shape[2] * sb * 4
        ),
    )(*inputs)


def _voxel_grad_kernel(
    feat_ref,  # (1, 16, R)
    dd_ref,    # (1, sb, 1, R) d_density for this (slab block, chunk)
    *rest,     # [meta_ref if win] dvol_ref (out, revisited over chunks)
    bilinear: bool,
    nr: int,
    nc: int,
    win_rows: int = 0,
    slab_batch: int = 1,
    march_sign: int = 1,
    halo: int = 0,
    aux=jax.lax.Precision.HIGHEST,
    subtexel: int = 0,
):
    rest = list(rest)
    meta_ref = rest.pop(0) if win_rows else None
    (dvol_ref,) = rest
    c = pl.program_id(1)
    jb = pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        dvol_ref[:] = jnp.zeros_like(dvol_ref)

    feat = feat_ref[0]
    rays = feat.shape[-1]

    # skipped replay steps emitted all-zero cotangents; window starts come
    # precomputed (fwd_mod.build_step_meta), one block-level branch +
    # per-step branches inside (pl.when branches cost ~230ns each here)
    nzv = jnp.any(
        jnp.any(dd_ref[0] != 0.0, axis=2, keepdims=True), axis=1, keepdims=True
    )  # (sb, 1, 1)
    # Mosaic can only squeeze 32-bit elements to scalars: extract via int32
    nzi = nzv.astype(jnp.int32)
    flags = [nzi[i, 0, 0] > 0 for i in range(slab_batch)]
    block_nz = jnp.max(nzi) > 0
    _, _, r0s, _, _ = fwd_mod._read_step_meta(meta_ref, slab_batch, win_rows, halo, False)

    @pl.when(block_nz)
    def _block():
        for i in range(slab_batch):
            j = jb * slab_batch + i
            slice_row = i if march_sign > 0 else slab_batch - 1 - i
            dd = dd_ref[0, i]  # (1, R)
            jf = j.astype(jnp.float32) if hasattr(j, "astype") else jnp.float32(j)

            @pl.when(flags[i])
            def _accumulate(jf=jf, dd=dd, slice_row=slice_row, i=i):
                rows_c, cols_c, t = _coords(feat, jf, nr, nc, subtexel)
                hat_x = _hat(cols_c, nc, rays, bilinear)
                # snapped/box hat_y is exactly bf16-representable: 2 passes
                hint = "a" if (subtexel or not bilinear) else None
                if win_rows:
                    r0 = r0s[i + halo]
                    hat_y = _hat(rows_c, win_rows, rays, bilinear, base=r0)
                    w = pl.ds(r0, win_rows)
                    dvol_ref[slice_row, w, :] = dvol_ref[
                        slice_row, w, :
                    ] + fwd_mod.kernel_dot(
                        hat_y, hat_x * dd, (((1,), (1,)), ((), ())),
                        precision=aux, exact=hint,
                    )
                else:
                    hat_y = _hat(rows_c, nr, rays, bilinear)
                    dvol_ref[slice_row] = dvol_ref[slice_row] + fwd_mod.kernel_dot(
                        hat_y, hat_x * dd, (((1,), (1,)), ((), ())),
                        precision=aux, exact=hint,
                    )


def _voxel_grad_shaded_kernel(
    feat_ref,   # (1, 16, R)
    dd_ref,     # (1, sb, 4, R): density + 3 gradient-channel cotangents
    *rest,      # [meta_ref if win] dvol_ref (sb, NR, NC),
                # dgrad_ref (3, sb, NR, NC) — both revisited over chunks
    bilinear: bool,
    nr: int,
    nc: int,
    win_rows: int = 0,
    slab_batch: int = 1,
    march_sign: int = 1,
    halo: int = 0,
    aux=jax.lax.Precision.HIGHEST,
    subtexel: int = 0,
):
    rest = list(rest)
    meta_ref = rest.pop(0) if win_rows else None
    dvol_ref, dgrad_ref = rest
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        dvol_ref[:] = jnp.zeros_like(dvol_ref)
        dgrad_ref[:] = jnp.zeros_like(dgrad_ref)

    jb = pl.program_id(0)
    feat = feat_ref[0]
    rays = feat.shape[-1]

    nzv = jnp.any(
        jnp.any(dd_ref[0] != 0.0, axis=2, keepdims=True), axis=1, keepdims=True
    )  # (sb, 1, 1)
    # Mosaic can only squeeze 32-bit elements to scalars: extract via int32
    nzi = nzv.astype(jnp.int32)
    flags = [nzi[i, 0, 0] > 0 for i in range(slab_batch)]
    block_nz = jnp.max(nzi) > 0
    _, _, r0s, _, _ = fwd_mod._read_step_meta(meta_ref, slab_batch, win_rows, halo, False)

    @pl.when(block_nz)
    def _block():
        for i in range(slab_batch):
            j = jb * slab_batch + i
            slice_row = i if march_sign > 0 else slab_batch - 1 - i
            dd4 = dd_ref[0, i]  # (4, R)
            jf = j.astype(jnp.float32) if hasattr(j, "astype") else jnp.float32(j)

            @pl.when(flags[i])
            def _accumulate(jf=jf, dd4=dd4, slice_row=slice_row, i=i):
                rows_c, cols_c, t = _coords(feat, jf, nr, nc, subtexel)
                hat_x = _hat(cols_c, nc, rays, bilinear)
                # snapped/box hat_y is exactly bf16-representable: 2 passes
                hint = "a" if (subtexel or not bilinear) else None
                if win_rows:
                    r0 = r0s[i + halo]
                    hat_y = _hat(rows_c, win_rows, rays, bilinear, base=r0)
                    w = pl.ds(r0, win_rows)
                else:
                    hat_y = _hat(rows_c, nr, rays, bilinear)
                    w = slice(None)

                def outer(dd_row):
                    return fwd_mod.kernel_dot(
                        hat_y, hat_x * dd_row, (((1,), (1,)), ((), ())),
                        precision=aux, exact=hint,
                    )

                dvol_ref[slice_row, w, :] = dvol_ref[slice_row, w, :] + outer(
                    dd4[0:1]
                )
                for ch in range(3):
                    dgrad_ref[ch, slice_row, w, :] = dgrad_ref[
                        ch, slice_row, w, :
                    ] + outer(dd4[ch + 1 : ch + 2])


def will_fuse(n_chunks, sb, nr, nc, *, smoothing, shading, coloring,
              stored_density, u8):
    """Whether the backward runs the FUSED single-pass layout (the dd
    cotangents live in scratch and the voxel scatter rides the outer grid
    axis — see _replay_kernel).  The forward calls this too, to choose the
    stored-density residual layout the replay will read
    (fwd_mod._forward_call), so the predicate must stay the single source
    of truth for both sides."""
    inverted = n_chunks >= fwd_mod.INVERT_MIN_CHUNKS
    stored_grads = stored_density and shading
    slice_bytes = sb * nr * nc * (2 if u8 else 4)
    fused_streams = (
        (0 if stored_density else 1)
        + (0 if stored_grads else (3 if shading else 0))
        + (1 if coloring else 0)                          # input streams
        + 1 + (3 if shading else 0)                       # scatter outputs
    )
    fused_working = (
        48 * 1024 * 1024
        + n_chunks * (2 * N_FEATURES + 12) * RAYS_PER_CHUNK * 4
        + 2 * fused_streams * slice_bytes
    )
    return (
        inverted and not smoothing
        and fused_working <= 110 * 1024 * 1024
    )


def _backward_call(
    params, sign, vol_perm, lut, feats, fin, g_img, *,
    win_rows=0, imp_perm=None, ahead=None, grad_perm=None, coloring=False,
    knobs=None, dens=None, pairs=(), dens_pair=None,
):
    """Shared driver behind :func:`backward` / :func:`backward_shaded` /
    :func:`backward_coloring`.

    Runs the replay (pass 1) and, when the fused single-pass layout does
    not apply (chunk-outer grid or Gaussian smoothing), the voxel-gradient
    scatter (pass 2) plus the smoothing camera chain (pass 2b).  Returns
    ``(d_scatter, d_grad, d_lut, d_feats)``: ``d_scatter`` is d_vol_perm
    for the TF modes or d_imp_perm for coloring; ``d_grad`` is the
    gradient-field cotangent (None unless shaded); ``d_lut`` is None for
    coloring (its rgba never reads the LUT).  The grid/alias/out-spec
    bookkeeping — historically triplicated and a proven drift hazard —
    lives HERE once; the wrappers only select arguments and unpack."""
    if dens_pair is None:
        # the stored-density residual's layout was fixed by the forward —
        # re-derive it from the same whole-image statics
        # (fwd_mod._dens_pair_layout is the single source of truth)
        dens_pair = dens is not None and fwd_mod._dens_pair_layout(
            params, feats.shape[0], vol_perm.shape[0], vol_perm.shape[1],
            vol_perm.shape[2], pairs, fwd_mod._u8_active(params),
        )
    if feats.shape[0] > fwd_mod.CHUNK_GROUP:
        # chunk grouping, as in fwd_mod._forward_call: the resident
        # per-chunk state (feats/fin/g_img/d_feats/accumulator — 152 KB
        # per chunk) must fit VMEM, so large images run as sequential
        # group calls; the scatter grids/LUT gradients SUM over groups,
        # the per-chunk d_feats concatenate.  A pair-layout residual is
        # sliced by each group's pair-bucket span, not its chunk span.
        G = fwd_mod.CHUNK_GROUP
        n = feats.shape[0]
        acc = None
        dfeats = []
        pair_off = 0
        for gi, g0 in enumerate(range(0, n, G)):
            g1 = min(g0 + G, n)
            if dens is None:
                dens_g = None
            elif dens_pair:
                dens_g = dens[pair_off : pair_off + int(pairs[gi])]
                pair_off += int(pairs[gi])
            else:
                dens_g = dens[g0:g1]
            res = _backward_call(
                params, sign, vol_perm, lut, feats[g0:g1], fin[g0:g1],
                g_img[g0:g1], win_rows=win_rows, imp_perm=imp_perm,
                ahead=None if ahead is None else ahead[g0:g1],
                grad_perm=grad_perm, coloring=coloring, knobs=knobs,
                dens=dens_g, pairs=pairs[gi : gi + 1], dens_pair=dens_pair,
            )
            d_scatter, d_grad, d_lut, d_feats_g = res
            dfeats.append(d_feats_g)
            if acc is None:
                acc = [d_scatter, d_grad, d_lut]
            else:
                acc = [
                    None if x is None else x + y
                    for x, y in zip(acc, (d_scatter, d_grad, d_lut))
                ]
        return acc[0], acc[1], acc[2], jnp.concatenate(dfeats, axis=0)
    from volym_tpu.config import Interpolation

    if knobs is None:
        knobs = params.knobs()
    thr = knobs[0, 0]
    lookahead = ahead is not None
    shading = grad_perm is not None
    smoothing = params.use_gaussian_smoothing
    assert not ((dens is not None) and params.camera_grads), (
        "camera cotangents need the volume slice (dhat chain / d-F_TS tap"
        " rows) — the stored-density replay never streams it"
    )
    assert not (coloring and lookahead), "coloring replaces the look-ahead gate"
    # u8 integer-exact streaming: EXACTLY the forward's gate and scaling
    # (fwd_mod._u8_active / _forward_call) — the replay must reproduce the
    # forward's masks bit-for-bit, so both sides run in the same scaled
    # density domain.  The scatter outputs are d/d(scaled) and are
    # rescaled by 255 below (d_imp is NOT scaled: the importance grid
    # never enters the scaled domain).
    u8 = fwd_mod._u8_active(params)
    if u8:
        knobs = knobs * jnp.asarray([[255.0, 1.0]], jnp.float32)
        thr = knobs[0, 0]
        vol_perm = jnp.round(vol_perm * 255.0)
        # the gradient field stays f32 (non-dyadic 0.01-offset tap blend
        # is not bf16-exact — see fwd_mod._forward_call)
    n_chunks = feats.shape[0]
    n_slabs, nr, nc = vol_perm.shape
    bilinear = params.interpolation == Interpolation.TRILINEAR
    # mirror the forward's batch; smoothing needs sb > SMOOTH_HALO for the
    # stencil's previous-block halo rows
    sb = SLAB_BATCH
    if n_slabs % sb:
        sb = 1
    if smoothing and sb <= fwd_mod.SMOOTH_HALO:
        raise NotImplementedError(
            "Pallas Gaussian smoothing needs the slab count divisible by 8"
        )
    n_blocks = n_slabs // sb
    if coloring:
        # dummy grouped LUT — the coloring replay never reads it
        b = jnp.zeros(
            (4 * (256 // fwd_mod.TF_GROUP), fwd_mod.TF_GROUP + 1), jnp.float32
        )
    else:
        b = fwd_mod.lut_groups(lut)
    inverted = n_chunks >= fwd_mod.INVERT_MIN_CHUNKS
    # pass-2 fusion (inverted grid only, see _replay_kernel): the scatter
    # blocks ride the OUTER grid axis and accumulate in VMEM, so dd never
    # touches HBM and pass 2 disappears.  The fused layout's working set
    # (double-buffered input streams + the grid-riding scatter OUTPUT
    # blocks + the per-chunk resident state) must fit the chip's VMEM —
    # at 512^3 with shading it does not (the 3-channel grad stream plus
    # the d_vol/d_grad outputs are ~160 MB vs 128 MB physical on v5e),
    # so the backward falls back to the two-pass layout there
    stored_density = dens is not None
    # shaded stored residuals are width 4 (density + 3 gradient-field
    # sample rows): the replay streams NEITHER the volume nor the grad
    # field (see _replay_step_body g_override)
    stored_grads = stored_density and shading
    dens_w = 4 if shading else 1
    fuse = will_fuse(
        n_chunks, sb, nr, nc, smoothing=smoothing, shading=shading,
        coloring=coloring, stored_density=stored_density, u8=u8,
    )
    dd_w = 4 if shading else 1  # density (or d_imp) + 3 grad-field channels

    # compacted live-pair grid (fwd_mod.build_pairs/pair_buckets) — fused
    # layout only: unfused pass 2 reads the dd OUTPUT blocks of every
    # pair, and a compacted pass 1 leaves never-visited blocks
    # uninitialised (in the fused layout dd is scratch and the scatter
    # blocks are pad-initialised, so the pair list is self-contained)
    n_pairs = int(pairs[0]) if pairs else 0
    compact = (
        fwd_mod.COMPACT and fuse and 0 < n_pairs < n_blocks * n_chunks
    )

    # index maps below are written in (chunk, block) order; W re-orders the
    # arguments for the inverted (slab-outer) grid — see INVERT_MIN_CHUNKS —
    # or reads (c, j) from the prefetched pair table on the compacted grid
    if compact:
        W = lambda f: (lambda i, p: f(p[fwd_mod.P_C, i], p[fwd_mod.P_J, i]))
    else:
        W = (lambda f: (lambda j, c: f(c, j))) if inverted else (lambda f: f)
    slab_index = W(
        (lambda c, j: (j, 0, 0)) if sign > 0 else (
            lambda c, j: (n_blocks - 1 - j, 0, 0)
        )
    )
    grad_index = W(
        (lambda c, j: (0, j, 0, 0)) if sign > 0 else (
            lambda c, j: (0, n_blocks - 1 - j, 0, 0)
        )
    )
    occupancy = nr % fwd_mod.OCC_BLOCK == 0 and nc % fwd_mod.OCC_BLOCK == 0
    # fast_math extends to the backward with the same contract as the
    # forward: the replay DENSITY contraction stays exact (threshold-mask
    # integrity) and only the auxiliary matmuls — voxel/LUT/grad-field
    # scatters and the camera dhat chains — drop to DEFAULT (single-pass
    # bf16, ~2^-9 relative on the gradients; bounded and measured in
    # BASELINE.md).
    aux_prec = (
        jax.lax.Precision.DEFAULT if params.fast_math
        else jax.lax.Precision.HIGHEST
    )
    # Column windowing stays OFF in the backward: the replay body is big
    # enough that the per-batch fits/full branch DUPLICATION alone costs
    # ~+10ms/frame at 256² (measured with identical full bodies in both
    # branches), swamping the halved matmuls.  The plumbing is kept (and
    # CI-pinned exact vs full width) for architectures where it pays;
    # enable via VOLYM_BWD_WIN_COLS=1.
    win_cols = (
        fwd_mod.window_cols(nc, smoothing) if BWD_WIN_COLS else 0
    )
    replay = partial(
        _replay_kernel,
        bilinear=bilinear,
        win_rows=win_rows,
        win_cols=win_cols,
        slab_batch=sb,
        march_sign=sign,
        occupancy=occupancy,
        coloring=coloring,
        shading=shading,
        lookahead=lookahead,
        smoothing=smoothing,
        num_steps=n_slabs,
        camera_grads=params.camera_grads,
        inverted=inverted,
        fuse_scatter=fuse,
        aux=aux_prec,
        subtexel=params.subtexel_bits,
        stored_density=stored_density,
        stored_grads=stored_grads,
        nr=nr,
        nc=nc,
        u8=u8,
        compact=compact,
    )
    # inputs in the replay kernel's pop order (see _replay_kernel *rest).
    # With stored density the forward's per-step density output replaces
    # the volume-slice stream entirely (the replay neither re-samples nor
    # reads the volume — only the XLA-side occupancy meta below does).
    if stored_density and dens_pair:
        # pair-layout residual (fwd_mod._dens_pair_layout): sequential
        # grid-index blocks, matching the compacted forward's store
        assert compact, "pair-layout dens requires the compacted replay"
        dens_spec = pl.BlockSpec(
            (1, sb, dens_w, RAYS_PER_CHUNK), lambda i, p: (i, 0, 0, 0)
        )
    else:
        dens_spec = pl.BlockSpec(
            (1, sb, dens_w, RAYS_PER_CHUNK), W(lambda c, j: (c, j, 0, 0))
        )
    in_specs = [
        pl.BlockSpec(
            (n_chunks, N_FEATURES, RAYS_PER_CHUNK), W(lambda c, j: (0, 0, 0))
        ),
        (
            dens_spec
            if stored_density
            else pl.BlockSpec((sb, nr, nc), slab_index)
        ),
        pl.BlockSpec((1, 2), W(lambda c, j: (0, 0)), memory_space=pltpu.SMEM),
    ]
    vol_stream = vol_perm.astype(jnp.bfloat16) if u8 else vol_perm
    inputs = [feats, dens if stored_density else vol_stream, knobs]
    if smoothing and not stored_density:
        # previous / next MARCH blocks (clamped at the sweep ends) for the
        # slab-axis stencil's halo rows
        if sign > 0:
            prev_index = lambda c, j: (jnp.maximum(j - 1, 0), 0, 0)
            next_index = lambda c, j: (jnp.minimum(j + 1, n_blocks - 1), 0, 0)
        else:
            prev_index = lambda c, j: (n_blocks - 1 - jnp.maximum(j - 1, 0), 0, 0)
            next_index = lambda c, j: (
                n_blocks - 1 - jnp.minimum(j + 1, n_blocks - 1), 0, 0,
            )
        # halo streams match the main stream's dtype (see fwd_mod)
        in_specs.append(pl.BlockSpec((sb, nr, nc), W(prev_index)))
        inputs.append(vol_stream)
        in_specs.append(pl.BlockSpec((sb, nr, nc), W(next_index)))
        inputs.append(vol_stream)
    if coloring:
        in_specs.append(pl.BlockSpec((sb, nr, nc), slab_index))
        inputs.append(imp_perm)
    if occupancy or win_rows or win_cols:
        occ = None
        if occupancy:
            occ = (
                fwd_mod.occupancy_grid_smooth(vol_perm, thr)
                if smoothing
                else fwd_mod.occupancy_grid(vol_perm, thr)
            )
        halo = fwd_mod.SMOOTH_HALO if (smoothing and win_rows) else 0
        meta = fwd_mod.build_step_meta(
            feats, occ, n_slabs=n_slabs, sb=sb, sign=sign, nr=nr, nc=nc,
            margin=fwd_mod.smooth_occ_margin(nr) if smoothing else 1.0,
            win_rows=win_rows, halo=halo, win_cols=win_cols,
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, meta.shape[3]), W(lambda c, j: (c, j, 0, 0)),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(meta)
    if shading and not stored_grads:
        in_specs.append(pl.BlockSpec((3, sb, nr, nc), grad_index))
        inputs.append(grad_perm)
    if lookahead:
        in_specs.append(
            pl.BlockSpec((1, sb, 1, RAYS_PER_CHUNK), W(lambda c, j: (c, j, 0, 0)))
        )
        inputs.append(ahead)
    in_specs += [
        pl.BlockSpec(b.shape, W(lambda c, j: (0, 0))),
        pl.BlockSpec((n_chunks, 4, RAYS_PER_CHUNK), W(lambda c, j: (0, 0, 0))),
        pl.BlockSpec((n_chunks, 4, RAYS_PER_CHUNK), W(lambda c, j: (0, 0, 0))),
    ]
    inputs += [b, fin, g_img]
    # in the fused path dd lives in scratch (no consumer outside); the
    # accumulated d_feats is a whole-array RESIDENT output (constant index
    # map, VMEM-held across every revisit, written back once) — no aliased
    # per-iteration HBM round trips; the replay accumulator likewise lives
    # in a whole-array VMEM scratch
    out_specs = ([] if fuse else [
        pl.BlockSpec((1, sb, dd_w, RAYS_PER_CHUNK), W(lambda c, j: (c, j, 0, 0))),
    ]) + [
        pl.BlockSpec(b.shape, W(lambda c, j: (0, 0))),
        pl.BlockSpec(
            (n_chunks, N_FEATURES, RAYS_PER_CHUNK), W(lambda c, j: (0, 0, 0))
        ),
    ]
    out_shape = ([] if fuse else [
        jax.ShapeDtypeStruct(
            (n_chunks, n_slabs, dd_w, RAYS_PER_CHUNK), jnp.float32
        ),
    ]) + [
        jax.ShapeDtypeStruct(b.shape, jnp.float32),
        jax.ShapeDtypeStruct((n_chunks, N_FEATURES, RAYS_PER_CHUNK), jnp.float32),
    ]
    scratch = [pltpu.VMEM((n_chunks, 4, RAYS_PER_CHUNK), jnp.float32)]
    if fuse:
        # fused pass 2: the scatter blocks (d_vol — or d_imp for coloring —
        # plus the gradient field when shaded) ride the OUTER grid axis
        out_specs.append(pl.BlockSpec((sb, nr, nc), slab_index))
        out_shape.append(jax.ShapeDtypeStruct((n_slabs, nr, nc), jnp.float32))
        if shading:
            out_specs.append(pl.BlockSpec((3, sb, nr, nc), grad_index))
            out_shape.append(
                jax.ShapeDtypeStruct((3, n_slabs, nr, nc), jnp.float32)
            )
        scratch.append(pltpu.VMEM((1, sb, dd_w, RAYS_PER_CHUNK), jnp.float32))
    compiler_params = fwd_mod.vmem_params(
        smoothing or fuse or (coloring and shading),
        resident_bytes=n_chunks * (2 * N_FEATURES + 12)
        * RAYS_PER_CHUNK * 4,
        # stored density removes only the VOLUME slice stream; the
        # shading gradient field (3 channels) and the coloring
        # importance slice still ride the grid at full block size —
        # and so do the FUSED scatter OUTPUT blocks (d_vol/d_imp
        # slice + the 3-channel d_grad), which Mosaic double-buffers
        # against the same scoped limit
        slice_bytes=sb * nr * nc * 4,
        n_streams=(
            (0 if stored_density else (3 if smoothing else 1))
            + (0 if stored_grads else (3 if shading else 0))
            + (1 if coloring else 0)
            + ((1 + (3 if shading else 0)) if fuse else 0)
        ),
    )
    if compact:
        pair_tab, chunk_visited, overflow = fwd_mod.build_pairs(
            feats, n_slabs, sb, n_pairs
        )
        res = pl.pallas_call(
            replay,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_pairs,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=compiler_params,
        )(pair_tab, *inputs)
        # never-visited chunks' resident d_feats blocks are uninitialised
        # (their true cotangent is exactly zero: no active ray); a bucket
        # overflow poisons every output loudly (see fwd_mod.build_pairs)
        res = list(res)
        res[1] = jnp.where(chunk_visited[:, None, None], res[1], 0.0)
        res = [fwd_mod._poison_on_overflow(x, overflow) for x in res]
    else:
        res = pl.pallas_call(
            replay,
            grid=(n_blocks, n_chunks) if inverted else (n_chunks, n_blocks),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=compiler_params,
        )(*inputs)

    def fold(dlx):
        return None if coloring else fwd_mod.fold_lut_groups_grad(dlx, lut.shape[0])

    def rescale(d_scatter, d_grad):
        # d/d(scaled volume) -> d/d(v/255 volume): the x255 chain; d_imp
        # (coloring) and d_grad (f32 gradient field) are unscaled
        if u8 and d_scatter is not None and not coloring:
            d_scatter = d_scatter * 255.0
        return d_scatter, d_grad

    if fuse:
        d_scatter, d_grad = rescale(res[2], res[3] if shading else None)
        return d_scatter, d_grad, fold(res[0]), res[1]

    dd, d_lut, d_feats = res[0], fold(res[1]), res[2]
    if smoothing and not coloring:
        # channel 0 is the SMOOTHED-density cotangent — fold the stencil
        # back onto plain rows before scattering; any gradient-field
        # channels (1..3) sample at each step's own coords and pass as-is.
        # (Coloring never folds: its row 0 is the d_imp cotangent — under
        # smoothing the density only gates the threshold mask there.)
        dd0 = _smooth_dd_transpose(feats, dd[:, :, 0:1, :], n_slabs, bilinear, nr=nr, nc=nc)
        dd = jnp.concatenate([dd0, dd[:, :, 1:, :]], axis=2) if shading else dd0

    # Pass 2: dd is indexed by MARCH step j; the scatter output block is
    # the PHYSICAL slab block.
    phys_index = (lambda j, c: (j, 0, 0)) if sign > 0 else (
        lambda j, c: (n_blocks - 1 - j, 0, 0)
    )
    phys_grad_index = (lambda j, c: (0, j, 0, 0)) if sign > 0 else (
        lambda j, c: (0, n_blocks - 1 - j, 0, 0)
    )
    halo2 = fwd_mod.SMOOTH_HALO if (smoothing and not coloring) else 0
    feat_spec = pl.BlockSpec(
        (1, N_FEATURES, RAYS_PER_CHUNK), lambda j, c: (c, 0, 0)
    )
    meta_p2_specs, meta_p2_inputs = [], []
    if win_rows:
        meta_p2 = fwd_mod.build_step_meta(
            feats, None, n_slabs=n_slabs, sb=sb, sign=sign, nr=nr, nc=nc,
            margin=1.0, win_rows=win_rows, halo=halo2,
        )
        meta_p2_specs = [
            pl.BlockSpec(
                (1, 1, 1, meta_p2.shape[3]), lambda j, c: (c, j, 0, 0),
                memory_space=pltpu.SMEM,
            )
        ]
        meta_p2_inputs = [meta_p2]

    def scatter_plain(dd1, box):
        """(C, slabs, 1, R) step cotangents -> (slabs, nr, nc) grid."""
        vox = partial(
            _voxel_grad_kernel, bilinear=False if box else bilinear,
            nr=nr, nc=nc, win_rows=win_rows, slab_batch=sb, march_sign=sign,
            halo=halo2, aux=aux_prec, subtexel=params.subtexel_bits,
        )
        return pl.pallas_call(
            vox,
            grid=(n_blocks, n_chunks),
            in_specs=[
                feat_spec,
                pl.BlockSpec((1, sb, 1, RAYS_PER_CHUNK), lambda j, c: (c, j, 0, 0)),
            ] + meta_p2_specs,
            out_specs=pl.BlockSpec((sb, nr, nc), phys_index),
            out_shape=jax.ShapeDtypeStruct((n_slabs, nr, nc), jnp.float32),
            compiler_params=fwd_mod.vmem_params(
                False, slice_bytes=sb * nr * nc * 4
            ),
        )(feats, dd1, *meta_p2_inputs)

    def scatter_shaded(dd4):
        """(C, slabs, 4, R) -> ((slabs, nr, nc), (3, slabs, nr, nc))."""
        voxs = partial(
            _voxel_grad_shaded_kernel, bilinear=bilinear, nr=nr, nc=nc,
            win_rows=win_rows, slab_batch=sb, march_sign=sign, halo=halo2,
            aux=aux_prec, subtexel=params.subtexel_bits,
        )
        return pl.pallas_call(
            voxs,
            grid=(n_blocks, n_chunks),
            in_specs=[
                feat_spec,
                pl.BlockSpec((1, sb, 4, RAYS_PER_CHUNK), lambda j, c: (c, j, 0, 0)),
            ] + meta_p2_specs,
            out_specs=[
                pl.BlockSpec((sb, nr, nc), phys_index),
                pl.BlockSpec((3, sb, nr, nc), phys_grad_index),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_slabs, nr, nc), jnp.float32),
                jax.ShapeDtypeStruct((3, n_slabs, nr, nc), jnp.float32),
            ],
            # at 256^3 the double-buffered (sb, nr, nc) + (3, sb, nr, nc)
            # output blocks overflow Mosaic's 16 MB default scoped limit
            # by ~0.3 MB — same cap bump as the heavy forward kernels;
            # at 512^3 the blocks themselves need the slice budget
            compiler_params=fwd_mod.vmem_params(
                True, slice_bytes=sb * nr * nc * 4, n_streams=4
            ),
        )(feats, dd4, *meta_p2_inputs)

    d_grad = None
    if coloring:
        # d_imp scatters with BOX hats (nearest-filtered importance grid)
        d_scatter = scatter_plain(dd[:, :, 0:1, :], box=True)
        if shading:
            # combined mode: the gradient-field rows 1..3 scatter with
            # BILINEAR hats (row 0 zeroed — the direct d_volume term is
            # zero a.e., density only gates the threshold mask)
            dd4z = jnp.concatenate(
                [jnp.zeros_like(dd[:, :, 0:1, :]), dd[:, :, 1:, :]], axis=2
            )
            _dvol_zero, d_grad = scatter_shaded(dd4z)
    elif shading:
        d_scatter, d_grad = scatter_shaded(dd)
    else:
        d_scatter = scatter_plain(dd, box=False)

    d_scatter, d_grad = rescale(d_scatter, d_grad)
    if smoothing and bilinear and params.camera_grads and not coloring:
        # Pass 2b: the plain rows' own bilinear-hat camera chain (fused
        # into pass 1 when unsmoothed; see _feats_grad_kernel).  Box
        # (nearest) hats have zero coordinate gradient -> skipped.
        d_feats = d_feats + _run_feats_grad(
            feats, vol_perm, dd[:, :, 0:1, :], bilinear=bilinear,
            win_rows=win_rows, sb=sb, sign=sign, aux=aux_prec,
            subtexel=params.subtexel_bits,
        )
    return d_scatter, d_grad, d_lut, d_feats


def backward(params, major, sign, vol_perm, lut, feats, fin, g_img, win_rows=0, imp_perm=None, ahead=None, knobs=None, dens=None, pairs=()):
    """Run both backward passes.

    Args:
      feats: (C, 16, RAYS) packed per-ray coefficients (fwd layout).
      fin:   (C, 4, RAYS) forward output (residual).
      g_img: (C, 4, RAYS) upstream cotangent.
      win_rows: static y-window size (0 = full slices).
      imp_perm/ahead: permuted importance grid + (C, n_slabs, 1, R) ahead
        bits — enables the importance-driven look-ahead gate in the replay
        (a zero-gradient mask; both inputs get no cotangent).
    Returns:
      (d_vol_perm, d_lut, d_feats).
    """
    d_vol, _d_grad, d_lut, d_feats = _backward_call(
        params, sign, vol_perm, lut, feats, fin, g_img,
        win_rows=win_rows, imp_perm=imp_perm, ahead=ahead, knobs=knobs,
        dens=dens, pairs=pairs,
    )
    return d_vol, d_lut, d_feats


def backward_shaded(
    params, major, sign, vol_perm, grad_perm, lut, feats, fin, g_img,
    win_rows=0, imp_perm=None, ahead=None, knobs=None, dens=None, pairs=(),
):
    """Both backward passes for the Blinn-Phong-shaded mode.

    Returns ``(d_vol_perm, d_grad_perm, d_lut, d_feats)``: the replay
    re-samples the precomputed gradient field (``slab.gradient_volume``)
    with the same hats and chains the shading analytically — the field
    cotangent scatters back into ``grad_perm`` (-> the volume through the
    jnp ``gradient_volume`` chain outside), the half-vector cotangent
    lands in the F_HX..F_HZ feats rows (-> camera dirs).
    ``imp_perm``/``ahead`` enable the look-ahead gate (zero-gradient mask).
    """
    return _backward_call(
        params, sign, vol_perm, lut, feats, fin, g_img,
        win_rows=win_rows, imp_perm=imp_perm, ahead=ahead, grad_perm=grad_perm,
        knobs=knobs, dens=dens, pairs=pairs,
    )


def backward_coloring(params, major, sign, vol_perm, imp_perm, feats, fin, g_img, win_rows=0, grad_perm=None, knobs=None, dens=None, pairs=()):
    """Both backward passes for the importance-coloring mode.

    Returns ``(d_imp_perm, d_feats)`` — or, with ``grad_perm`` (the
    coloring+shading combined mode), ``(d_imp_perm, d_grad_perm,
    d_feats)``.  rgba comes from the box-filtered importance sample, so
    its cotangent scatters into the IMPORTANCE grid (box hats in pass 2);
    the volume/LUT gradients are zero a.e. (density only gates the
    threshold mask) except through the shading gradient field, whose
    channel cotangents scatter into ``grad_perm`` (-> the volume via the
    jnp ``gradient_volume`` chain outside).
    """
    d_imp, d_grad, _d_lut, d_feats = _backward_call(
        params, sign, vol_perm, None, feats, fin, g_img,
        win_rows=win_rows, imp_perm=imp_perm, grad_perm=grad_perm,
        coloring=True, knobs=knobs, dens=dens, pairs=pairs,
    )
    if grad_perm is None:
        return d_imp, d_feats
    return d_imp, d_grad, d_feats
