"""Pallas TPU kernel for the slab-marching renderer.

Replaces every texture gather with dense MXU contractions ("hat" matmuls):
for march step j, a ray chunk's bilinear sample of slice S is

    sample[r] = sum_y sum_x S[y, x] * hatY[y, r] * hatX[x, r]

where ``hat`` is the triangle kernel ``max(0, 1 - |coord - i|)`` — exactly
the bilinear weight, with exactly two nonzero entries per ray (a box kernel
``-0.5 <= coord - i < 0.5`` gives nearest-neighbour filtering).  The y
contraction is one (256, 256) x (256, RAYS) MXU matmul per (chunk, slab);
the x contraction is a VPU sublane reduction.  The transfer-function lookup
is the same trick against the (256, 4) LUT.  Sample coordinates are linear
in the march index (precomputed per-ray slope/intercept on the host), so
the kernel needs no per-step host data.

Everything lives in (y/x/feature on sublanes, rays on lanes) orientation —
no in-kernel transposes.  The grid is (ray_chunks, slabs) with slabs
iterating fastest; the output block doubles as the front-to-back
accumulator across the slab axis (standard revisited-block accumulation).

Validated against :mod:`volym_tpu.render.slab`'s gather-based jnp golden
(same math, arbitrary order of summation differences only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volym_tpu.config import Interpolation, RenderParams
from volym_tpu.render import rays as rays_mod
from volym_tpu.render import slab as slab_mod

#: pixel tile side; chunks are TILE*TILE rays.  Smaller tiles shrink every
#: per-step footprint (tighter y windows, tighter occupancy flags) at the
#: cost of more grid iterations; env-overridable for experiments.
TILE = int(__import__("os").environ.get("VOLYM_TILE", "32"))
#: chunk tile WIDTH (pixels): a rectangular TILE x TILE_W chunk keeps the
#: row-window footprint of a TILE-row tile while packing more rays per
#: grid iteration.  Measured NEGATIVE (r5): 32x64 halves both grids'
#: iteration counts but fwd+bwd regressed 10.0 -> 13.6 ms at 256^2 —
#: the wider column footprint forfeits the column window and the
#: 2048-lane step bodies pipeline worse, echoing the TILE=64/16
#: negatives.  sb=8 / 32x32 remains the measured optimum of this
#: landscape; the knob stays for other cameras/architectures.
TILE_W = int(__import__("os").environ.get("VOLYM_TILE_W", str(TILE)))
RAYS_PER_CHUNK = TILE * TILE_W
N_FEATURES = 16  # padded to a sublane tile multiple
#: slack the y-window must carry beyond the rows spread: 1 texel for the
#: hat support + up to 8 for sublane alignment of the window start + 1
WIN_SLACK = 10
#: smallest window worth emitting (sublane tile floor)
MIN_WIN_ROWS = 16
#: sub-slabs marched per grid step: amortises the ~2us/step grid+DMA floor
SLAB_BATCH = int(__import__("os").environ.get("VOLYM_SLAB_BATCH", "8"))
#: max ray chunks per pallas call: resident feats (64 KB/chunk) + output
#: (16 KB/chunk) must fit VMEM next to the slice blocks; larger images run
#: as sequential chunk-group calls (see _forward_call / _backward_call).
CHUNK_GROUP = int(__import__("os").environ.get("VOLYM_CHUNK_GROUP", "256"))
#: minimum chunk count for the inverted (slab-outer) grid.  With slabs on
#: the OUTER grid axis the slice block index is constant across the inner
#: chunk sweep, so pallas fetches each volume slab block ONCE per frame
#: instead of once per chunk (4.3 GB -> 67 MB of slice DMA at 256^2) —
#: measured ~10x on the pure-DMA pattern (scripts/_alias_probe.py).  The
#: per-chunk accumulator then persists across non-consecutive revisits via
#: an input/output-aliased HBM block; the revisit distance (n_chunks
#: iterations) must comfortably exceed the 2-deep DMA pipeline, hence the
#: floor.
INVERT_MIN_CHUNKS = 8

# feature row indices in the packed (16, RAYS) block
F_RS, F_RB, F_CS, F_CB, F_TS, F_TB, F_ENTRY, F_EXIT, F_AEXP, F_SIGNOK = range(10)
F_HX, F_HY, F_HZ = 10, 11, 12  # per-ray Blinn-Phong half vector
F_CD, F_C2 = 13, 14  # cam.dir and |cam|^2: the look-ahead range quirk
#: per-direction cone look-ahead coefficient rows: 8 dirs x 7 coefficients,
#: padded to an 8-row stride so every direction's row i lives at sublane
#: offset i — Mosaic's concatenate requires equal offsets on the non-concat
#: dimension, and the wide cone sample concatenates the 8 per-direction
#: (1, R) coordinate rows along lanes.
CF_STRIDE = 8
CONE_FEATURES = 8 * CF_STRIDE
CF_RS, CF_RB, CF_CS, CF_CB, CF_TS, CF_TB, CF_RATE = range(7)


def _march_kernel(
    feat_ref,  # [pairs_ref if compact] (C, 16, RAYS) whole-array resident
    slice_ref,  # (sb, NR, NC) volume slices for this march block
    *rest,  # knobs_ref, [meta_ref if occupancy|win] [imp_ref if coloring] [grad_ref if shading] lut_ref, out_ref (C, 4, RAYS) resident
    num_steps: int,
    bilinear: bool,
    coloring: bool = False,
    shading: bool = False,
    precision=jax.lax.Precision.HIGHEST,
    win_rows: int = 0,
    win_cols: int = 0,
    slab_batch: int = 1,
    march_sign: int = 1,
    occupancy: bool = False,
    lookahead: bool = False,
    smoothing: bool = False,
    inverted: bool = False,
    first_hit: bool = False,
    subtexel: int = 0,
    emit_density: bool = False,
    u8: bool = False,
    compact: bool = False,
):
    rest = list(rest)
    if compact:
        # compacted live-pair grid (build_pairs): the scalar-prefetch pair
        # table replaces the 2-D grid — (C, J) come from the table, the
        # out-init fires on the chunk's FIRST visited pair, and pad pairs
        # (live=0) fall through every gate in one scalar branch
        pairs_ref, feat_ref, slice_ref = feat_ref, slice_ref, rest.pop(0)
    # live-mutation knobs (density threshold, early-termination alpha) ride
    # as SMEM scalars — the TPU analog of the reference's per-frame uniform
    # update (src/gpu_resources/parameters.rs:68-83): a slider drag changes
    # the traced value, not the compiled kernel
    knobs_ref = rest.pop(0)
    threshold = knobs_ref[0, 0]
    early_alpha = knobs_ref[0, 1]
    prev_ref = rest.pop(0) if smoothing else None
    next_ref = rest.pop(0) if smoothing else None
    meta_ref = rest.pop(0) if (occupancy or win_rows or win_cols) else None
    imp_ref = rest.pop(0) if coloring else None
    grad_ref = rest.pop(0) if shading else None
    ahead_ref = rest.pop(0) if lookahead else None
    if emit_density:
        (lut_ref, out_all, dens_all) = rest
    else:
        (lut_ref, out_all) = rest
        dens_all = None
    if compact:
        i = pl.program_id(0)
        C, J = pairs_ref[P_C, i], pairs_ref[P_J, i]
        pair_first_c = pairs_ref[P_FIRST_C, i] > 0
        pair_live = pairs_ref[P_LIVE, i] > 0
    elif inverted:
        J, C = pl.program_id(0), pl.program_id(1)
    else:
        C, J = pl.program_id(0), pl.program_id(1)
    # The feats input and the output accumulator are WHOLE-ARRAY resident
    # VMEM blocks (constant index maps): pallas fetches feats once per
    # frame and writes the output once per chunk, instead of a 64 KB feats
    # DMA + a 2x16 KB aliased-accumulator HBM round trip per grid
    # iteration — the dominant terms of the measured per-iteration
    # scaffold floor (BASELINE.md roofline).  Kernel code below sees
    # per-chunk (1, ., R) sub-refs, exactly like the old per-block refs.
    feat_ref = feat_ref.at[pl.ds(C, 1)]
    out_ref = out_all.at[pl.ds(C, 1)]

    @pl.when(pair_first_c if compact else J == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    if dens_all is not None:
        # the per-step density output block (consumed by the stored-density
        # backward replay) is written every iteration: pre-zero it once so
        # skipped batches/steps publish exactly-zero density (-> zero mask,
        # zero contribution in the replay), mirroring the replay's dd
        # pre-zero.  Compacted: only LIVE pairs zero their block — a tail
        # pad aliases an already-written (0, n_blocks-1) block and must
        # not clobber it; never-visited pairs' blocks stay garbage but the
        # (equally compacted, equally gated) replay never reads them.
        if compact:
            @pl.when(pair_live)
            def _zero_dens():
                dens_all[0] = jnp.zeros_like(dens_all[0])
        else:
            dens_all[0] = jnp.zeros_like(dens_all[0])

    # Block-level empty-space gate: per-step footprint flags and window
    # starts PRECOMPUTED once per frame on the XLA side (build_step_meta)
    # and read here as SMEM scalars; ONE branch skips the whole batch when
    # no step touches an occupied block, and the per-step branches only
    # execute inside live blocks.  (The in-kernel (sb, R) reductions this
    # replaces were ~2.7 ms/frame at 256² — the all-mode floor.)
    halo = SMOOTH_HALO if (smoothing and win_rows) else 0
    occ_flags, block_occ, r0s, c0_b, fits_b = _read_step_meta(
        meta_ref, slab_batch, win_rows, halo, occupancy, win_cols
    )
    # Whole-chunk skipping.  With occupancy meta the (chunk, batch)
    # t-window/sign activity is already folded into block_occ on the XLA
    # side, so the kernel's gate is ONE scalar branch and, inside it, one
    # lane reduce for the only dynamic term (early-alpha saturation) —
    # nesting the branches keeps the empty-block path free of any VPU
    # work (the per-iteration floor).  Without meta (non-32-divisible
    # grids) the t-window gate is computed from the feats as before;
    # per-sample validity inside _march_step_body is unaffected either
    # way (this gate is purely a skip).
    if occupancy:
        chunk_active = block_occ
    else:
        feat0 = feat_ref[0]
        jf0 = (J * slab_batch).astype(jnp.float32)
        t_now = feat0[F_TS : F_TS + 1, :] * jf0 + feat0[F_TB : F_TB + 1, :]
        t_last = t_now + feat0[F_TS : F_TS + 1, :] * jnp.float32(slab_batch - 1)
        can_contribute = (
            (out_ref[0][3:4, :] < early_alpha)
            & (t_now < feat0[F_EXIT : F_EXIT + 1, :])
            & (t_last >= feat0[F_ENTRY : F_ENTRY + 1, :])
            & (feat0[F_SIGNOK : F_SIGNOK + 1, :] > 0.5)
        )
        chunk_active = jnp.any(can_contribute)
    if compact:
        # pad pairs alias a real (chunk, block)'s meta/feats — their own
        # liveness bit is the authority
        chunk_active = chunk_active & pair_live

    def _steps():
        feat = feat_ref[0]
        smooth_rows = None
        if smoothing:
            # Batch-amortised Gaussian smoothing: plain density rows for
            # march offsets [-HALO, sb + HALO) from the prev/cur/next
            # slice blocks, then each sub-step's smoothed density is a
            # per-ray slab-axis stencil over them (see render/slab.py
            # smoothed_densities, the jnp spec).  Volume-edge offsets
            # fall back to the clamped edge row (clamp-to-edge semantics).
            def local_row(i):
                return i if march_sign > 0 else slab_batch - 1 - i

            def drow(block_ref, i_local, off):
                jf = (J * slab_batch + off).astype(jnp.float32)
                return _density_row(
                    block_ref, local_row(i_local), feat, jf,
                    bilinear=bilinear, win_rows=win_rows, precision=precision,
                    r0=None if r0s is None else r0s[off + halo],
                    subtexel=subtexel,
                )

            d_cur = [drow(slice_ref, i, i) for i in range(slab_batch)]
            d_next = []
            for h in range(SMOOTH_HALO):
                off = slab_batch + h
                jj = J * slab_batch + off
                cand = drow(next_ref, h, off)
                d_next.append(
                    jnp.where(jj <= num_steps - 1, cand, d_cur[slab_batch - 1])
                )
            d_prev = []
            for h in range(SMOOTH_HALO):
                off = -SMOOTH_HALO + h  # -3, -2, -1
                jj = J * slab_batch + off
                cand = drow(prev_ref, slab_batch + off, off)
                d_prev.append(jnp.where(jj >= 0, cand, d_cur[0]))
            d_rows = d_prev + d_cur + d_next
            nr_s, nc_s = slice_ref.shape[1], slice_ref.shape[2]
            smooth_rows = [
                _smooth_row(
                    feat, (J * slab_batch + i).astype(jnp.float32), d_rows, i,
                    num_steps, bilinear, nr=nr_s, nc=nc_s,
                )
                for i in range(slab_batch)
            ]
        def steps(win_c, c0):
            for i in range(slab_batch):
                # march index; the slice block holds slab_batch physical
                # slabs (reversed within the block when marching
                # back-to-front)
                _march_step(
                    feat_ref, slice_ref, imp_ref, grad_ref, lut_ref, out_ref,
                    j=J * slab_batch + i,
                    slice_row=i if march_sign > 0 else slab_batch - 1 - i,
                    bilinear=bilinear, early_alpha=early_alpha,
                    threshold=threshold, precision=precision,
                    win_rows=win_rows, win_cols=win_c,
                    coloring=coloring, ahead_ref=ahead_ref, ahead_row=i,
                    density_override=(
                        None if smooth_rows is None else smooth_rows[i]
                    ),
                    occupied=None if occ_flags is None else occ_flags[i],
                    r0=None if r0s is None else r0s[i + halo],
                    c0=c0,
                    first_hit=first_hit,
                    subtexel=subtexel,
                    dens_ref=dens_all,
                    dens_row=i,
                    u8=u8,
                )

        if win_cols and fits_b is not None:
            # ONE column-window branch per slab batch: when the batch's
            # union footprint fits the aligned lane window, every
            # sampling matmul and x contraction shrinks by nc/win_cols
            @pl.when(fits_b)
            def _win_steps():
                steps(win_cols, c0_b)

            @pl.when(jnp.logical_not(fits_b))
            def _full_steps():
                steps(0, None)
        else:
            steps(0, None)

    if occupancy:
        # nested gates: empty blocks take ONE scalar branch and do no VPU
        # work at all; live blocks pay one lane reduce for the dynamic
        # saturation term before committing to the step bodies
        @pl.when(chunk_active)
        def _occupied():
            @pl.when(jnp.any(out_ref[0][3:4, :] < early_alpha))
            def _unsaturated():
                _steps()
    else:
        @pl.when(chunk_active)
        def _active():
            _steps()


#: implementation of the "exact" (HIGHEST-precision) kernel contractions:
#: "x6" = Mosaic HIGHEST (6 single-pass bf16 matmuls, fp32-faithful);
#: "x3" = manual 3-pass bf16 split — operands split as x = hi + lo with
#: hi = bf16(x), lo = bf16(x - hi); hi@hi + hi@lo + lo@hi drops only the
#: lo@lo term, bounding the error by ~2^-16 of each product (vs ~2^-24
#: for x6) at half the MXU passes.  Read at trace time (a flip after the
#: first jit call does NOT retrace — select in a fresh process via the
#: VOLYM_EXACT_DOT env var).  Shipped default: x3 — every mode passes
#: hardware validation against the f32 goldens (images 6e-5 class,
#: gradients 4e-4 worst-case rel, scripts/validate_slab_tpu.py) at
#: 1.4-1.8x the x6 frame rate; set VOLYM_EXACT_DOT=x6 for fp32-faithful
#: contractions.
EXACT_DOT = __import__("os").environ.get("VOLYM_EXACT_DOT", "x3")

#: stored-density backward (default on): the differentiable forward emits
#: the per-step sampled density (f32, (C, n_slabs, 1, R) — 67 MB at 256²,
#: ~1 GB at 1024² with 256 slabs) and the backward replay LOADS it instead
#: of re-contracting the volume slice against the hats — dropping the
#: replay's 2-pass exact density matmul (~2 ms/frame at 256²) and its
#: volume-slice streaming, and making the backward's threshold masks
#: bit-identical to the forward's by construction.  Applies when neither
#: Gaussian smoothing (block-stencil densities) nor camera cotangents
#: (whose dhat chain needs the slice anyway) are in play.  Disable via
#: VOLYM_STORE_DENSITY=0 (the replay then recomputes — bit-identical
#: results, measured slower).
STORE_DENSITY = __import__("os").environ.get("VOLYM_STORE_DENSITY", "1") == "1"

#: debug-mode verification of kernel_dot's caller-owned exact= contract:
#: when set (the eager-emulator CI path enables it — values are concrete
#: there), the hinted operand is checked to round-trip bf16 exactly, so a
#: wrong hint fails loudly in CI instead of shipping as a silent
#: DEFAULT-precision regression.  No-op under tracing (real kernels).
CHECK_EXACT_HINT = __import__("os").environ.get("VOLYM_CHECK_EXACT_HINT", "") == "1"


def _verify_exact_hint(x, side):
    if not CHECK_EXACT_HINT or isinstance(x, jax.core.Tracer):
        return
    xx = jnp.asarray(x)
    if not bool(jnp.all(xx.astype(jnp.bfloat16).astype(jnp.float32) == xx)):
        raise AssertionError(
            f"kernel_dot exact='{side}' hint violated: the hinted operand "
            "is not exactly bf16-representable — the 2-pass contraction "
            "would silently round it (DEFAULT-precision class)"
        )


def kernel_dot(a, b, dims, precision, exact=None):
    """MXU contraction with the kernel's precision policy: HIGHEST routes
    through :data:`EXACT_DOT`; anything else is a plain dot_general.

    ``exact``: ``'a'`` / ``'b'`` asserts that operand is exactly
    bf16-representable (sign patterns like dhat in {-1, 0, 1}, box hats in
    {0, 1}, or subtexel-snapped triangle hats in k/2^SUBTEXEL_BITS — see
    :func:`volym_tpu.render.slab.snap`).  The hi/lo split then applies only
    to the other operand: 2 MXU passes instead of 3, dropping a term of
    the SAME ~2^-18-relative class as x3's lo@lo (the split operand's
    second residual), so the x3 error bound holds unchanged.  The caller
    owns the exactness contract; a wrong hint silently loses the operand's
    low bits (plain bf16 rounding, DEFAULT-precision class).

    A BF16 operand (the u8-volume integer stream, see
    ``RenderParams.u8_volume``) short-circuits to ONE pass: the other
    operand must carry an exact hint (its bf16 cast is lossless), so every
    bf16xbf16 product is exact and the MXU's f32 accumulation makes the
    whole contraction EXACT — strictly fewer passes than x3/x6 at
    strictly better accuracy.
    """
    if a.dtype == jnp.bfloat16 or b.dtype == jnp.bfloat16:
        x, y = a, b
        if x.dtype != jnp.bfloat16:
            assert exact in ("a", "ab"), "f32 operand needs an exactness hint"
            _verify_exact_hint(x, "a")
            x = x.astype(jnp.bfloat16)
        if y.dtype != jnp.bfloat16:
            assert exact in ("b", "ab"), "f32 operand needs an exactness hint"
            _verify_exact_hint(y, "b")
            y = y.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    if precision != jax.lax.Precision.HIGHEST or EXACT_DOT == "x6":
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32, precision=precision
        )

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    if exact == "a":
        _verify_exact_hint(a, "a")
        a16 = a.astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return d(a16, b_hi) + d(a16, b_lo)
    if exact == "b":
        _verify_exact_hint(b, "b")
        b16 = b.astype(jnp.bfloat16)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return d(a_hi, b16) + d(a_lo, b16)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _meta_cols(slab_batch: int, win_rows: int, halo: int, occupancy: bool,
               win_cols: int = 0) -> int:
    """Width of the packed per-(chunk, march-block) meta row: [block_occ,
    flags[0..sb)] when occupancy, then [r0s[0..sb+2*halo)] when windowed,
    then [c0_block, fits_block] when column-windowed (ONE window per slab
    batch — per-step branches cost ~0.25us each, which at 256² eats the
    matmul saving; the batch-union footprint fits almost as often)."""
    k = (1 + slab_batch) if occupancy else 0
    if win_rows:
        k += slab_batch + 2 * halo
    if win_cols:
        k += 2
    return k


def _read_step_meta(meta_ref, slab_batch, win_rows, halo, occupancy,
                    win_cols=0):
    """Unpack the precomputed step meta (see :func:`build_step_meta`) from
    its (1, 1, 1, K) SMEM block: scalar reads instead of the in-kernel
    (sb, R) lane reductions that used to be the per-iteration floor.

    Returns ``(flags, block_occ, r0s, c0, fits)``: ``flags[i]`` scalar
    bool per march-local step (footprint touches an occupied block AND any
    ray active), ``block_occ`` their OR, ``r0s[i]`` scalar int32 window
    starts (multiples of 8; ``None`` when ``win_rows == 0``), ``c0``
    scalar int32 column-window start (multiple of ``win_cols``) with
    ``fits`` scalar bool — whether the BATCH's active-ray column footprint
    fits the aligned ``win_cols`` window (``None, None`` when ``win_cols
    == 0``; one window per slab batch, so the kernel branches once per
    batch, not per step).  ``halo`` extends the r0 list to march offsets
    [-halo, slab_batch + halo) — ``r0s[off + halo]`` — for the
    Gaussian-smoothing stencil prologue."""
    if meta_ref is None:
        return None, None, None, None, None
    flags = block_occ = r0s = c0 = fits = None
    off = 0
    if occupancy:
        block_occ = meta_ref[0, 0, 0, 0] > 0
        flags = [meta_ref[0, 0, 0, 1 + i] > 0 for i in range(slab_batch)]
        off = 1 + slab_batch
    if win_rows:
        r0s = [
            pl.multiple_of(meta_ref[0, 0, 0, off + i], 8)
            for i in range(slab_batch + 2 * halo)
        ]
        off += slab_batch + 2 * halo
    if win_cols:
        c0 = pl.multiple_of(meta_ref[0, 0, 0, off], win_cols)
        fits = meta_ref[0, 0, 0, off + 1] > 0
    return flags, block_occ, r0s, c0, fits


def build_step_meta(feats, occ, *, n_slabs, sb, sign, nr, nc, margin,
                    win_rows, halo=0, win_cols=0):
    """Per-(chunk, march-block) kernel scaffold meta, computed ONCE per
    frame as plain XLA ops (fused under the caller's jit) instead of per
    grid iteration inside the kernel.

    The kernels' only data-dependent control flow is (a) the block-level
    empty-space gate — does march step j's active-ray sampling footprint
    touch any occupied occupancy block? — and (b) the dynamic start of the
    static y window.  Both are pure functions of the per-ray feats, the
    occupancy grid, and the march index, so hoisting them out of the
    kernel removes ~6 cross-lane min/max reductions per grid iteration
    (measured ~2.7 ms/frame at 256² — the all-mode kernel floor; the
    builder itself is ~0.13 ms on the same chip).

    Args:
      feats: (C, N_FEATURES, R) chunked per-ray coefficients.
      occ:   (n_slabs, nr/32, nc/32) occupancy grid in PHYSICAL slab order
             (:func:`occupancy_grid`), or ``None`` for window starts only.
      margin: in-plane footprint margin in texels (1 texel hat support;
             :func:`smooth_occ_margin` under Gaussian smoothing).
      halo:  widens the window-placement activity interval by ``halo*|ts|``
             and extends the r0 list to march offsets [-halo, sb + halo)
             (the Gaussian-smoothing stencil prologue reads plain rows
             there).  The occupancy flags keep the EXACT central-step
             activity: skip exactness under smoothing is provided by the
             dilated occupancy grid + widened margin, not by this mask.

    Returns int32 (C, n_blocks, 1, K) with K = :func:`_meta_cols`; row
    layout ``[block_occ, flags[0..sb)][, r0s[0..sb+2*halo)]``, consumed by
    :func:`_read_step_meta` from a (1, 1, 1, K) SMEM block per grid step
    (4-D so the block's trailing dims equal the array's — the Mosaic
    block-shape divisibility rule).
    """
    occupancy = occ is not None
    if not occupancy and not win_rows and not win_cols:
        return None
    n_blocks = n_slabs // sb
    n_ext = n_slabs + 2 * halo
    jf = (jnp.arange(n_ext, dtype=jnp.float32) - halo)[None, :, None]

    def row(i):
        return feats[:, i, :][:, None, :]  # (C, 1, R)

    rows_c = jnp.clip(row(F_RS) * jf + row(F_RB), 0.0, nr - 1.0)  # (C, S', R)
    t = row(F_TS) * jf + row(F_TB)
    signok = row(F_SIGNOK) > 0.5
    entry, exit_ = row(F_ENTRY), row(F_EXIT)
    active = signok & (t >= entry) & (t < exit_)
    if halo:
        slack = jnp.abs(row(F_TS)) * jnp.float32(halo)
        act_w = signok & (t >= entry - slack) & (t < exit_ + slack)
    else:
        act_w = active

    cols = []
    cen = slice(halo, halo + n_slabs) if halo else slice(None)
    if occupancy:
        a_c = active[:, cen]
        r_c = rows_c[:, cen]
        cols_c = jnp.clip(row(F_CS) * jf + row(F_CB), 0.0, nc - 1.0)[:, cen]
        any_active = jnp.any(a_c, axis=2)  # (C, S)
        rmin = jnp.min(jnp.where(a_c, r_c, jnp.float32(nr)), axis=2)
        rmax = jnp.max(jnp.where(a_c, r_c, jnp.float32(-1.0)), axis=2)
        cmin = jnp.min(jnp.where(a_c, cols_c, jnp.float32(nc)), axis=2)
        cmax = jnp.max(jnp.where(a_c, cols_c, jnp.float32(-1.0)), axis=2)
        # march step j reads physical slab j (sign>0) or n_slabs-1-j
        sidx = jnp.arange(n_slabs) if sign > 0 else n_slabs - 1 - jnp.arange(n_slabs)
        ob = occ[sidx] > 0.5  # (S, br, bc) march order
        br, bc = ob.shape[1], ob.shape[2]
        by = (jnp.arange(br, dtype=jnp.float32) * OCC_BLOCK)[None, None, :, None]
        bx = (jnp.arange(bc, dtype=jnp.float32) * OCC_BLOCK)[None, None, None, :]
        inside = (
            (by + (OCC_BLOCK - 1) >= (rmin - margin)[:, :, None, None])
            & (by <= (rmax + margin)[:, :, None, None])
            & (bx + (OCC_BLOCK - 1) >= (cmin - margin)[:, :, None, None])
            & (bx <= (cmax + margin)[:, :, None, None])
        )  # (C, S, br, bc)
        hit = jnp.any(ob[None] & inside, axis=(2, 3))  # (C, S)
        flags = (hit & any_active).reshape(-1, n_blocks, sb)
        block_occ = jnp.any(flags, axis=2, keepdims=True)
        cols += [block_occ.astype(jnp.int32), flags.astype(jnp.int32)]
    if win_rows:
        rows_min_w = jnp.min(
            jnp.where(act_w, rows_c, jnp.float32(nr)), axis=2
        )  # (C, S')
        r0 = jnp.clip(
            jnp.floor((rows_min_w - 1.0) / 8.0) * 8.0, 0.0, nr - win_rows
        ).astype(jnp.int32)
        idx = (
            jnp.arange(n_blocks)[:, None] * sb
            + jnp.arange(sb + 2 * halo)[None, :]
        )  # (NB, sb + 2*halo): march index b*sb + k - halo, shifted by +halo
        cols.append(r0[:, idx])  # (C, NB, sb + 2*halo)
    if win_cols:
        # Column window: ONE aligned lane-window start + fits bit per slab
        # BATCH (the union of the batch's per-step active-ray column
        # footprints, hat support [cmin-1, cmax+1]) — a per-step branch
        # would cost ~0.25us/step, eating the matmul saving, and the
        # batch union fits ~as often (80.7% vs 81.7% per-step at 256²).
        # Batches with no active rays get fits=0 (the full path runs; its
        # samples are masked anyway).  Same activity definition as the
        # kernel's valid mask — inactive rays never composite.
        a_c = active[:, cen]
        cw_c = jnp.clip(row(F_CS) * jf + row(F_CB), 0.0, nc - 1.0)[:, cen]
        c_lo = jnp.min(jnp.where(a_c, cw_c, jnp.float32(nc)), axis=2) - 1.0
        c_hi = jnp.minimum(
            jnp.max(jnp.where(a_c, cw_c, jnp.float32(-1.0)), axis=2) + 1.0,
            nc - 1.0,
        )  # highest hat-support index (clamp-to-edge caps it at nc-1)
        step_has = jnp.any(a_c, axis=2)  # (C, S)
        nb = n_slabs // sb
        sh_b = step_has.reshape(-1, nb, sb)
        lo_b = jnp.min(
            jnp.where(sh_b, c_lo.reshape(-1, nb, sb), jnp.float32(nc)), axis=2
        )
        hi_b = jnp.max(
            jnp.where(sh_b, c_hi.reshape(-1, nb, sb), jnp.float32(-1.0)),
            axis=2,
        )
        any_b = jnp.any(sh_b, axis=2)
        wc = jnp.float32(win_cols)
        c0 = jnp.clip(
            jnp.floor(jnp.maximum(lo_b, 0.0) / wc) * wc, 0.0, nc - win_cols
        )
        fits_b = any_b & (hi_b < c0 + win_cols) & (lo_b >= c0 - 0.5)
        cols.append(c0.astype(jnp.int32)[:, :, None])  # (C, NB, 1)
        cols.append(fits_b.astype(jnp.int32)[:, :, None])
    meta = jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]
    return meta[:, :, None, :]  # (C, NB, 1, K)


#: side of the square occupancy blocks for empty-space skipping
OCC_BLOCK = 32

#: lane width of the column window (Mosaic lane slices must start at
#: 128-aligned offsets, so this is both the window size and its alignment).
#: VOLYM_WIN_COLS=0 disables column windowing (A/B experiments).
WIN_COLS = int(__import__("os").environ.get("VOLYM_WIN_COLS", "128"))


def window_cols(nc: int, smoothing: bool, heavy: bool = False) -> int:
    """Static column-window width: 128 when the slice's lane dim can halve
    (and the mode doesn't preclude it), else 0.  Unlike the y window the
    lane window is all-or-nothing per batch (128-aligned starts only), so
    no per-camera sizing: the per-batch fits bit (build_step_meta) sends
    straddling batches down the full-width path.  Gaussian smoothing
    samples plain rows at shifted march offsets whose column footprints
    differ from the central step's — it keeps the full-width path.
    ``heavy`` marks kernels whose step body is big enough that compiling
    BOTH the windowed and full branches costs more than the halved
    matmuls save (measured: the exact-precision shaded forward, +2.4ms at
    256², and every backward replay, +10ms — see slab_bwd_kernel)."""
    if smoothing or heavy or WIN_COLS <= 0:
        return 0
    if nc % WIN_COLS == 0 and nc > WIN_COLS:
        return WIN_COLS
    return 0


#: rows of the compacted-grid pair table (see build_pairs)
P_C, P_J, P_FIRST_C, P_FIRST_B, P_LIVE = range(5)

#: kill switch for the compacted (live-pair) grid; the full
#: (n_blocks, n_chunks) grid is always available for A/B
COMPACT = __import__("os").environ.get("VOLYM_COMPACT", "1") == "1"


def build_pairs(feats, n_slabs: int, sb: int, n_pairs: int):
    """Compacted-grid pair table: the (chunk, march-block) pairs with any
    geometrically active ray, j-sorted, padded to the static ``n_pairs``.

    The production grids iterate ALL (chunk, slab-block) pairs and skip
    dead ones with a scalar branch — but the per-iteration Mosaic scaffold
    (~0.7 us fwd / ~1.5 us bwd) still runs, and at the bench camera only
    47% of pairs are even geometrically reachable (any ray of the chunk
    with the right sign whose t-window [entry, exit) meets the block's
    march steps).  A scalar-prefetch grid over just the live pairs removes
    the dead iterations entirely; occupancy-dead (but geometric) pairs
    keep their one-branch skip via the existing meta gate.

    The pair COUNT must be static (it is the grid size): the caller
    derives a conservative host-side bucket from the camera
    (:func:`pair_buckets`, same per-camera ladder idea as
    :func:`window_rows`) and this builder packs the traced table:

    - live pairs in (j, c) order — j-major keeps the slice-block index
      map non-decreasing, so each volume slab block still streams at most
      once per call, exactly like the inverted full grid;
    - one pad pair ``(c=0, j)`` for every march block with NO live chunk,
      so its fused d_volume output block (and its forward out revisit
      bookkeeping) is still zero-initialised — pads carry ``live=0`` and
      do no other work;
    - tail pads at ``(0, n_blocks-1)`` (an already-streamed block: no
      extra slice DMA) up to ``n_pairs``.

    Rows (int32): ``[c, j, first_visit_of_chunk, first_visit_of_block,
    live]``.  Returns ``(pairs, chunk_visited, overflow)``:
    ``chunk_visited`` masks outputs of never-visited chunks (their VMEM
    blocks are uninitialised), and ``overflow`` is True iff the static
    bucket was too small — the caller turns the frame into NaNs rather
    than silently dropping work (the host bound is widened by ±1 slab
    precisely so this never fires; tests/test_compact_pairs.py sweeps
    cameras against it).
    """
    C = feats.shape[0]
    nb = n_slabs // sb

    def row(i):
        return feats[:, i, :][:, None, :]  # (C, 1, R)

    jf = jnp.arange(n_slabs, dtype=jnp.float32)[None, :, None]
    t = row(F_TS) * jf + row(F_TB)
    active = (
        (row(F_SIGNOK) > 0.5) & (t >= row(F_ENTRY)) & (t < row(F_EXIT))
    )  # (C, S, R)
    geo = jnp.any(active, axis=2).reshape(C, nb, sb).any(axis=2)  # (C, NB)

    g = geo.T  # (NB, C): j-major
    jb_dead = ~jnp.any(g, axis=1)  # (NB,)
    take = g | (jb_dead[:, None] & (jnp.arange(C) == 0)[None, :])
    flat = take.reshape(-1)
    n_taken = jnp.sum(flat)
    idx = jnp.arange(nb * C, dtype=jnp.int32)
    # stable compaction: taken pairs keep (j, c) order, rest pushed back
    order = jnp.argsort(jnp.where(flat, idx, idx + nb * C))
    sel = order[:n_pairs]
    valid = jnp.arange(n_pairs, dtype=jnp.int32) < n_taken
    jsel = jnp.where(valid, (sel // C).astype(jnp.int32), nb - 1)
    csel = jnp.where(valid, (sel % C).astype(jnp.int32), 0)
    live = valid & geo.T.reshape(-1)[sel]
    # first LIVE pair of each chunk (out/acc/d_feats init); argmax = first
    # True along the j axis
    jfirst = jnp.argmax(geo, axis=1).astype(jnp.int32)  # (C,)
    first_c = live & (jsel == jfirst[csel])
    # first TAKEN pair of each block (fused d_vol block init — pads count:
    # a dead block's pad is exactly what zeroes its output block)
    cfirst = jnp.argmax(take, axis=1).astype(jnp.int32)  # (NB,)
    first_b = valid & (csel == cfirst[jsel])
    pairs = jnp.stack(
        [
            csel,
            jsel,
            first_c.astype(jnp.int32),
            first_b.astype(jnp.int32),
            live.astype(jnp.int32),
        ]
    )
    return pairs, jnp.any(geo, axis=1), n_taken > n_pairs


def _poison_on_overflow(arr, overflow):
    """NaN-poison an output if the static pair bucket overflowed: a loud
    wrong-by-construction frame instead of silently dropped march work."""
    return jnp.where(overflow, jnp.float32(jnp.nan), arr)


def _dens_pair_layout(params, n_chunks, n_slabs, nr, nc, pairs, u8) -> bool:
    """Whether the stored-density residual rides the compacted PAIR layout
    ``(n_pairs, sb, w, R)`` instead of the chunk layout
    ``(C, n_slabs, w, R)``.

    On the compacted grid the chunk layout's dens OUTPUT block index is
    data-dependent ``(c, j)``; a pair-indexed residual makes it the
    sequential grid index — a statically pipelinable store — writes only
    live pairs' blocks, and halves the residual HBM at the bench
    occupancy.  The replay reads it back with the same sequential index.

    Must evaluate IDENTICALLY in the forward and the backward (the layout
    is baked into the residual array), so it is a pure function of the
    static config: every chunk group must run the compacted grid
    (otherwise a full-grid group would emit chunk-layout blocks and the
    group concat would mix layouts), and the backward must take the FUSED
    compacted replay (:func:`slab_bwd_kernel.will_fuse` — the unfused
    pass 1 runs the full grid, which cannot address pair-indexed blocks).
    """
    if not (COMPACT and pairs):
        return False
    sb = SLAB_BATCH if n_slabs % SLAB_BATCH == 0 else 1
    nb = n_slabs // sb
    groups = [
        min(CHUNK_GROUP, n_chunks - g0)
        for g0 in range(0, n_chunks, CHUNK_GROUP)
    ]
    if len(pairs) != len(groups):
        return False
    for p, g in zip(pairs, groups):
        if not (g >= INVERT_MIN_CHUNKS and 0 < int(p) < nb * g):
            return False
    from volym_tpu.ops import slab_bwd_kernel

    # fused_working is increasing in the group's chunk count, so if the
    # largest group fuses every group does
    return slab_bwd_kernel.will_fuse(
        max(groups), sb, nr, nc,
        smoothing=params.use_gaussian_smoothing,
        shading=params.use_shading,
        coloring=params.use_importance_coloring,
        stored_density=True,
        u8=u8,
    )


def occupancy_grid(vol_perm, threshold: float):
    """(N, NR, NC) permuted volume -> (N, NR/32, NC/32) block occupancy at
    the density threshold.  Interpolated (bilinear or nearest) values never
    exceed the max of their corner texels, so a step whose whole sampling
    footprint lies in empty blocks contributes exactly nothing — the
    block-level TPU analog of the reference's per-ray threshold skip
    (``wgsl:271-274``)."""
    n, nr, nc = vol_perm.shape
    occ = (
        vol_perm.reshape(
            n, nr // OCC_BLOCK, OCC_BLOCK, nc // OCC_BLOCK, OCC_BLOCK
        )
        >= threshold
    )
    return occ.any(axis=(2, 4)).astype(jnp.float32)


def occupancy_grid_smooth(vol_perm, threshold: float):
    """Occupancy dilated along the slab axis by the Gaussian stencil's
    reach (+-SMOOTH_HALO slabs): a smoothed density is a weighted AVERAGE
    of plain samples from slabs j-3..j+3, so if every sample the stencil
    can touch lies below the threshold the smoothed value does too, and
    the step contributes exactly nothing.  The in-plane tap displacement
    (|u| <= 0.01*N texels) is covered by the margin in build_step_meta."""
    occ = occupancy_grid(vol_perm, threshold)
    n = occ.shape[0]
    idx = jnp.arange(n)
    dil = occ
    for off in range(-SMOOTH_HALO, SMOOTH_HALO + 1):
        if off:
            dil = jnp.maximum(dil, occ[jnp.clip(idx + off, 0, n - 1)])
    return dil


def smooth_occ_margin(n_plane: int) -> float:
    """In-plane footprint margin under Gaussian smoothing: tap march-index
    offset |u| = |delta|/ts <= K*STEP*n_slabs planes (ts >= 1/n_slabs),
    in-plane crossing shift |u|*|slope| with |slope| <= n_plane/n_slabs
    texels/plane (dominant-axis marching) -> shift <= K*STEP*n_plane
    TEXELS regardless of the march-plane count, plus 1 texel of hat
    support.  Pass the slice texel resolution, not the plane count."""
    from volym_tpu.render.golden import GAUSSIAN_KERNEL_SIZE, GAUSSIAN_STEP

    return 1.0 + GAUSSIAN_KERNEL_SIZE * GAUSSIAN_STEP * n_plane


def _density_row(slice_ref, slice_row, feat, jf, *, bilinear, win_rows, precision, r0=None, subtexel=0):
    """One plain density row (1, R): bilinear/nearest slice sample at the
    ray crossings of march step jf (the sampling core of _march_step_body,
    reused by the Gaussian-smoothing stencil)."""
    nr, nc = slice_ref.shape[1], slice_ref.shape[2]
    rays = feat.shape[-1]
    rows_c = slab_mod.snap(
        jnp.clip(
            feat[F_RS : F_RS + 1, :] * jf + feat[F_RB : F_RB + 1, :],
            0.0, nr - 1.0,
        ),
        subtexel,
    )
    cols_c = slab_mod.snap(
        jnp.clip(
            feat[F_CS : F_CS + 1, :] * jf + feat[F_CB : F_CB + 1, :],
            0.0, nc - 1.0,
        ),
        subtexel,
    )

    def iota(n, base=None):
        v = jax.lax.broadcasted_iota(jnp.int32, (n, rays), 0).astype(jnp.float32)
        return v if base is None else v + base.astype(jnp.float32)

    def hat(coords, idx):
        d = coords - idx
        if bilinear:
            return jnp.maximum(0.0, 1.0 - jnp.abs(d))
        return ((d >= -0.5) & (d < 0.5)).astype(jnp.float32)

    # snapped (or box) hats are exactly bf16-representable: 2-pass contraction
    hint = "b" if (subtexel or not bilinear) else None
    if win_rows:
        assert r0 is not None, "windowed sampling needs a precomputed r0"
        hat_y = hat(rows_c, iota(win_rows, r0))
        sl = slice_ref[slice_row, pl.ds(r0, win_rows), :]
    else:
        hat_y = hat(rows_c, iota(nr))
        sl = slice_ref[slice_row]
    colvals = kernel_dot(sl, hat_y, (((0,), (0,)), ((), ())), precision, exact=hint)
    return jnp.sum(colvals * hat(cols_c, iota(nc)), axis=0, keepdims=True)


#: slab-axis stencil half-width of the resampled Gaussian taps (see
#: render/slab.py smoothed_densities — the jnp spec of this math)
SMOOTH_HALO = 3


def _smooth_row(feat, jf, d_rows, i, num_steps, bilinear, nr=None, nc=None):
    """Gaussian-smoothed density at sub-step i from the batch's plain
    density rows d_rows[off + SMOOTH_HALO] covering march offsets
    [-SMOOTH_HALO, slab_batch + SMOOTH_HALO)."""
    import math as _math

    from volym_tpu.render.golden import (
        GAUSSIAN_KERNEL_SIZE,
        GAUSSIAN_SIGMA,
        GAUSSIAN_STEP,
    )

    # PADDED lanes (a ray count that does not fill the last chunk —
    # _chunk_rays zero-pads) carry ts == 0 exactly; delta/0 would inject
    # inf/NaN that survives the downstream masks (NaN * 0 = NaN) and
    # poisons the stored density / voxel scatter.  Guard to a finite
    # dummy — padded lanes are invalid (sign_ok == 0) and contribute
    # nothing anyway.
    ts_raw = feat[F_TS : F_TS + 1, :]
    ts = jnp.where(ts_raw == 0.0, 1.0, ts_raw)
    rs = feat[F_RS : F_RS + 1, :]
    cs = feat[F_CS : F_CS + 1, :]
    rows_raw = rs * jf + feat[F_RB : F_RB + 1, :]
    cols_raw = cs * jf + feat[F_CB : F_CB + 1, :]
    # in-plane bounds use the slice TEXEL resolution, the slab bound the
    # march-plane count — they differ on slab-axis-resampled grids (the
    # step-size mapping); the jnp spec (render/slab.smoothed_densities)
    # makes the same split via n_rows/n_cols
    n = jnp.float32(num_steps)
    bnd_r = jnp.float32(num_steps if nr is None else nr)
    bnd_c = jnp.float32(num_steps if nc is None else nc)
    total = jnp.zeros_like(rows_raw)
    wsum = jnp.zeros_like(rows_raw)
    for tap in range(-GAUSSIAN_KERNEL_SIZE, GAUSSIAN_KERNEL_SIZE + 1):
        delta = tap * GAUSSIAN_STEP
        w = _math.exp(-(delta * delta) / (2.0 * GAUSSIAN_SIGMA * GAUSSIAN_SIGMA))
        u = delta / ts  # (1, R) march-index offset, per-ray constant
        rt = rows_raw + u * rs
        ct = cols_raw + u * cs
        st = jf + u
        in_box = (
            (rt >= -0.5) & (rt <= bnd_r - 0.5)
            & (ct >= -0.5) & (ct <= bnd_c - 0.5)
            & (st >= -0.5) & (st <= n - 0.5)
        ).astype(jnp.float32)
        tap_v = jnp.zeros_like(rows_raw)
        for off in range(-SMOOTH_HALO, SMOOTH_HALO + 1):
            d = u - off
            if bilinear:
                ker = jnp.maximum(0.0, 1.0 - jnp.abs(d))
            else:
                ker = ((d >= -0.5) & (d < 0.5)).astype(jnp.float32)
            tap_v = tap_v + ker * d_rows[i + off + SMOOTH_HALO]
        total = total + w * in_box * tap_v
        wsum = wsum + w * in_box
    return total / jnp.where(wsum > 0.0, wsum, 1.0)


#: group width of the two-level transfer-function lookup (see lut_groups)
TF_GROUP = 16


def lut_groups(lut):
    """Regroup the (LN, 4) TF LUT for the kernel's two-level lookup.

    The naive in-kernel LUT filter builds a (LN, R) hat and contracts it
    with the LUT — ~1M VPU ops per march step plus two matmuls whose tiny
    M/K dims (4) pad to full 128-wide MXU passes.  Instead: split the LN
    entries into LN/16 groups of 16 with one overlap entry
    (``B[ch*G + g, i] = lut[min(16*g + i, LN-1), ch]``); the kernel then
    builds a 17-row hat over the *within-group* offset, one (4G, 17) x
    (17, R) matmul, and a 16-row one-hot group select — ~0.3M VPU ops and
    a well-shaped matmul.  Exactly the same linear filter, regrouped.
    """
    ln = lut.shape[0]
    assert ln % TF_GROUP == 0, "LUT length must divide the TF group width"
    n_groups = ln // TF_GROUP
    ni = TF_GROUP + 1
    idx = jnp.clip(
        jnp.arange(n_groups)[:, None] * TF_GROUP + jnp.arange(ni)[None, :],
        0,
        ln - 1,
    )  # (G, NI)
    ext = lut[idx]  # (G, NI, 4)
    return ext.transpose(2, 0, 1).reshape(4 * n_groups, ni)


def fold_lut_groups_grad(dlx, ln):
    """Inverse of :func:`lut_groups` for cotangents: fold the (4G, NI)
    grouped-LUT gradient back onto the (LN, 4) LUT (overlap entries
    accumulate)."""
    n_groups = ln // TF_GROUP
    ni = TF_GROUP + 1
    flat = dlx.reshape(4, n_groups, ni).transpose(1, 2, 0).reshape(-1, 4)
    idx = jnp.clip(
        jnp.arange(n_groups)[:, None] * TF_GROUP + jnp.arange(ni)[None, :],
        0,
        ln - 1,
    ).reshape(-1)
    return jnp.zeros((ln, 4), jnp.float32).at[idx].add(flat)


def _tf_lookup(b, density, rays, precision=jax.lax.Precision.HIGHEST, dscale=None):
    """Two-level linear TF filter (identical math to the LN-row hat).

    Returns ``(rgba, onehot, diff, tri_o, tf_c_raw, ln)`` — the extras are
    reused by the replay backward (d rgba / d density and the LUT-gradient
    accumulation)."""
    n_groups = b.shape[0] // 4
    ni = b.shape[1]
    gw = ni - 1
    ln = gw * n_groups
    # the TF coordinate is NOT subtexel-snapped (unlike rows/cols): it is
    # a function of the computed density, which is not bit-identical
    # between the kernel's split-bf16 contraction and the jnp golden's
    # f32 bilinear — a snap here would make the two sides quantize to
    # different texels at ~1e-3-wide boundary bands, moving full d_lut
    # scatter weight between adjacent entries.  Volume coords CAN snap
    # because both sides share the bit-identical affine march
    # (slab.ray_affine); density cannot.
    # u8 mode (dscale = 1/255): density arrives in the scaled 0..255
    # domain, so the LUT coordinate scale folds 1/255 into the ln factor
    # (one constant; same f32-rounding class as the unscaled product)
    tf_c_raw = density * (float(ln) * (dscale if dscale else 1.0)) - 0.5
    tf_c = jnp.clip(tf_c_raw, 0.0, ln - 1.0)
    gf = jnp.floor(tf_c / gw)  # (1, R) group index as float
    o = tf_c - gf * gw  # within-group offset in [0, gw)
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (n_groups, rays), 0).astype(
        jnp.float32
    )
    onehot = (iota_g == gf).astype(jnp.float32)  # (G, R)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (ni, rays), 0).astype(jnp.float32)
    diff = o - iota_i  # (NI, R)
    tri_o = jnp.maximum(0.0, 1.0 - jnp.abs(diff))
    z = kernel_dot(b, tri_o, (((1,), (0,)), ((), ())), precision)  # (4G, R)
    rgba = jnp.concatenate(
        [
            jnp.sum(
                onehot * z[ch * n_groups : (ch + 1) * n_groups],
                axis=0,
                keepdims=True,
            )
            for ch in range(4)
        ],
        axis=0,
    )  # (4, R)
    return rgba, onehot, diff, tri_o, tf_c_raw, ln


def _march_step(feat_ref, slice_ref, imp_ref, grad_ref, lut_ref, out_ref, *, j, slice_row, bilinear, early_alpha, threshold, precision=jax.lax.Precision.HIGHEST, win_rows=0, win_cols=0, coloring=False, ahead_ref=None, ahead_row=0, density_override=None, occupied=None, r0=None, c0=None, first_hit=False, subtexel=0, dens_ref=None, dens_row=0, u8=False):
    jf = j.astype(jnp.float32) if hasattr(j, "astype") else jnp.float32(j)
    feat = feat_ref[0]  # (16, RAYS)
    rows_c = feat[F_RS : F_RS + 1, :] * jf + feat[F_RB : F_RB + 1, :]  # (1, R)
    cols_c = feat[F_CS : F_CS + 1, :] * jf + feat[F_CB : F_CB + 1, :]
    t = feat[F_TS : F_TS + 1, :] * jf + feat[F_TB : F_TB + 1, :]

    nr, nc = slice_ref.shape[1], slice_ref.shape[2]
    rays = rows_c.shape[-1]

    # clamp-to-edge in texel space reproduces wgpu addressing exactly;
    # the subtexel snap reproduces the sampler's fixed-point weights
    rows_c = slab_mod.snap(jnp.clip(rows_c, 0.0, nr - 1.0), subtexel)
    cols_c = slab_mod.snap(jnp.clip(cols_c, 0.0, nc - 1.0), subtexel)

    ahead = ahead_ref[0, ahead_row] if ahead_ref is not None else None

    def body():
        _march_step_body(
            feat, rows_c, cols_c, t, slice_ref, imp_ref, grad_ref, lut_ref,
            out_ref, slice_row=slice_row, bilinear=bilinear,
            early_alpha=early_alpha, threshold=threshold, precision=precision,
            win_rows=win_rows, coloring=coloring, ahead=ahead,
            density_override=density_override, r0=r0, first_hit=first_hit,
            win_cols=win_cols, c0=c0, subtexel=subtexel, dens_ref=dens_ref,
            dens_row=dens_row, u8=u8,
        )

    if occupied is None:
        body()
    else:
        # the precomputed empty-space flag (build_step_meta): a step whose
        # active-ray footprint misses every occupied block contributes
        # exactly nothing — skip its matmuls
        @pl.when(occupied)
        def _occupied_step():
            body()


def _march_step_body(feat, rows_c, cols_c, t, slice_ref, imp_ref, grad_ref, lut_ref, out_ref, *, slice_row, bilinear, early_alpha, threshold, precision, win_rows, coloring=False, ahead=None, density_override=None, r0=None, first_hit=False, win_cols=0, c0=None, subtexel=0, dens_ref=None, dens_row=0, u8=False):
    nr, nc = slice_ref.shape[1], slice_ref.shape[2]
    rays = rows_c.shape[-1]
    if win_cols:
        assert c0 is not None, "column-windowed sampling needs a c0"
        cw = pl.ds(c0, win_cols)
    else:
        cw = slice(None)
    nx = win_cols or nc  # lane width of the x contraction

    def tri(coords, idx):
        d = coords - idx
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))

    def boxk(coords, idx):
        d = coords - idx
        return ((d >= -0.5) & (d < 0.5)).astype(jnp.float32)

    vol_hat = tri if bilinear else boxk

    # The grids all sampled at (rows_c, cols_c) this step, as *ref
    # accessors* (Mosaic supports dynamic row windows only on ref indexing,
    # not on loaded values): the density slice, optionally 3 gradient-field
    # channels (volume filter), and the importance slice (always
    # nearest/box, importance.rs:122-131).
    # fast_math v2: the density contraction stays EXACT (HIGHEST) so the
    # threshold mask never flips; only the auxiliary grids (shading
    # gradient field, importance) run at the reduced precision.  With a
    # density_override (Gaussian smoothing precomputed the rows) the
    # density grid drops out entirely.
    # hat exactness for the 2-pass contraction (kernel_dot exact=): box
    # hats are {0, 1}; snapped triangle hats are multiples of 2^-subtexel
    vol_hint = "b" if (subtexel or not bilinear) else None
    grids = []
    if density_override is None:
        grids.append(
            (
                lambda w=None: slice_ref[slice_row, :, cw] if w is None else slice_ref[slice_row, w, cw],
                vol_hat,
                jax.lax.Precision.HIGHEST,
                vol_hint,
            )
        )
    grad_base = len(grids)
    if grad_ref is not None:
        for ch in range(3):
            grids.append(
                (
                    lambda w=None, ch=ch: grad_ref[ch, slice_row, :, cw]
                    if w is None
                    else grad_ref[ch, slice_row, w, cw],
                    vol_hat,
                    precision,
                    vol_hint,
                )
            )
    if imp_ref is not None:
        grids.append(
            (
                lambda w=None: imp_ref[slice_row, :, cw] if w is None else imp_ref[slice_row, w, cw],
                boxk,
                precision,
                "b",
            )
        )

    def y_iota(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n, rays), 0).astype(jnp.float32)

    # Windowed y contraction: a pixel tile's rows footprint on one slab is
    # a compact band, so contracting a win_rows-row window instead of the
    # full slice cuts the dominant matmul by NR/win_rows.  The window SIZE
    # is STATIC (host-side, per camera — see :func:`window_rows`); only its
    # start is dynamic per (chunk, slab).  A lax.cond between sizes would
    # execute both branches under Mosaic's predication and save nothing.
    if not grids:
        colvals = None
    elif win_rows:
        assert r0 is not None, "windowed sampling needs a precomputed r0"
        idx = y_iota(win_rows) + r0.astype(jnp.float32)
        w = pl.ds(r0, win_rows)
        colvals = jnp.stack(
            [
                kernel_dot(
                    g(w), k(rows_c, idx), (((0,), (0,)), ((), ())), prec,
                    exact=hint,
                )
                for g, k, prec, hint in grids
            ]
        )  # (G, NC, R)
    else:
        idx = y_iota(nr)
        colvals = jnp.stack(
            [
                kernel_dot(
                    g(), k(rows_c, idx), (((0,), (0,)), ((), ())), prec,
                    exact=hint,
                )
                for g, k, prec, hint in grids
            ]
        )

    x_idx = y_iota(nx) if not win_cols else y_iota(nx) + c0.astype(jnp.float32)
    hat_x = vol_hat(cols_c, x_idx)  # (NX, R)
    if density_override is None:
        density = jnp.sum(colvals[0] * hat_x, axis=0, keepdims=True)
    else:
        density = density_override
    if dens_ref is not None and grad_ref is None:
        # stored-density residual for the backward replay: bit-identical to
        # what the replay would recompute (same kernel_dot, same operands),
        # so the backward's threshold/early-alpha masks match the forward
        # BY CONSTRUCTION instead of by determinism
        dens_ref[0, dens_row] = density

    imp = (
        jnp.sum(colvals[colvals.shape[0] - 1] * boxk(cols_c, x_idx), axis=0, keepdims=True)
        if imp_ref is not None
        else None
    )
    if coloring:
        rgba = jnp.concatenate(
            [
                jnp.minimum(imp * 1.5, 1.0),
                (1.0 - imp) * 1.2,
                jnp.full_like(imp, 0.2),
                imp,
            ],
            axis=0,
        )  # (4, R)
    else:
        rgba = _tf_lookup(lut_ref[:], density, rays, dscale=(1.0 / 255.0) if u8 else None)[0]

    rgb = rgba[:3, :]
    if grad_ref is not None:
        # Blinn-Phong from the precomputed gradient field (wgsl:190-211);
        # eye == -ray_dir exactly, so the half vector is a per-ray feature
        from volym_tpu.render.shading import AMBIENT, DIFFUSE, SHININESS, SPECULAR

        gx = jnp.sum(colvals[grad_base + 0] * hat_x, axis=0, keepdims=True)
        gy = jnp.sum(colvals[grad_base + 1] * hat_x, axis=0, keepdims=True)
        gz = jnp.sum(colvals[grad_base + 2] * hat_x, axis=0, keepdims=True)
        if dens_ref is not None:
            # shaded stored residual: density + the 3 gradient-field
            # samples (width-4 rows) — the backward replay then streams
            # NEITHER the volume nor the gradient field (slab_bwd_kernel
            # stored_grads), reusing these bit-identical samples
            dens_ref[0, dens_row] = jnp.concatenate(
                [density, gx, gy, gz], axis=0
            )
        sq = gx * gx + gy * gy + gz * gz
        nonzero = sq > 0.0
        inv_norm = jax.lax.rsqrt(jnp.where(nonzero, sq, 1.0))
        nx, ny, nz = gx * inv_norm, gy * inv_norm, gz * inv_norm
        inv_sqrt3 = 0.57735026
        diffuse = jnp.maximum(0.0, (nx + ny + nz) * inv_sqrt3)
        hdotn = (
            feat[F_HX : F_HX + 1, :] * nx
            + feat[F_HY : F_HY + 1, :] * ny
            + feat[F_HZ : F_HZ + 1, :] * nz
        )
        spec = jnp.maximum(0.0, hdotn) ** SHININESS
        shaded = rgb * (AMBIENT + DIFFUSE * diffuse) + SPECULAR * spec
        rgb = jnp.where(nonzero, shaded, rgb)

    acc = out_ref[0]  # (4, R): rows 0..2 colour, row 3 alpha
    acc_a = acc[3:4, :]

    valid = (
        (feat[F_SIGNOK : F_SIGNOK + 1, :] > 0.5)
        & (t >= feat[F_ENTRY : F_ENTRY + 1, :])
        & (t < feat[F_EXIT : F_EXIT + 1, :])
    )
    m = valid & (density >= threshold) & (acc_a < early_alpha)
    if ahead is not None:
        # skip-if-important-ahead (wgsl:286-296).  The pre-pass emits the
        # COMBINED gate bit (important-ahead AND current sample non-opaque
        # at the same snapped box sample the kernel used to take here), so
        # the march neither samples nor streams the importance grid
        m = m & jnp.logical_not(ahead > 0.5)

    if first_hit:
        # first-hit-then-break (wgsl:319-323): the first contributing
        # sample wins; alpha = 1 retires the ray via the early-alpha gate
        mf = m.astype(jnp.float32)
        out_ref[0] = jnp.concatenate(
            [acc[:3, :] * (1.0 - mf) + rgb * mf, jnp.maximum(acc_a, mf)],
            axis=0,
        )
        return

    a = rgba[3:4, :]
    aexp = feat[F_AEXP : F_AEXP + 1, :]
    alpha = 1.0 - jnp.exp(aexp * jnp.log(jnp.maximum(1.0 - a, 1e-37)))
    w = (1.0 - acc_a) * alpha * m.astype(jnp.float32)  # (1, R)

    out_ref[0] = acc + jnp.concatenate([rgb * w, w], axis=0)


def _pack_features(camera_matrices, height, width, n_slabs, major, sign, layout, n_plane=None):
    """Per-ray linear coefficients of the march: sample coords, t, and the
    opacity-correction exponent as functions of the march index j."""
    origin, dirs = rays_mod.generate_rays(camera_matrices, height, width)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)
    feats = features_from_rays(
        origin, dirs, entry, exit_, n_slabs, major, sign, layout,
        n_plane=n_plane,
    )
    miss = exit_ <= entry
    return feats, miss


def features_from_rays(origin, dirs, entry, exit_, n_slabs, major, sign, layout, n_plane=None):
    """The feats matrix from an explicit ray bundle (the sharded renderers
    build per-shard rays themselves).  ``n_plane``: in-plane slice
    resolution when the slab axis is resampled (see slab.ray_affine)."""
    d_m = dirs[:, major]

    # slab(j) = j (sign>0) or N-1-j; z(j) = (slab(j)+0.5)/N — the affine
    # coefficients come from the SAME function the jnp goldens use
    # (slab.ray_affine), so kernel and golden evaluate identical
    # coordinates and the subtexel snap decides identically on both sides
    rs, rb, cs, cb, ts, tb = slab_mod.ray_affine(
        origin, dirs, n_slabs, major, sign, n_plane=n_plane
    )

    aexp = (1.0 / n_slabs) / jnp.maximum(jnp.abs(d_m), 1e-12) * 100.0
    signok = ((d_m * sign) > 0.0).astype(jnp.float32)

    # Blinn-Phong half vector: eye = normalize(cam - pos) = -dirs exactly
    light = jnp.float32(1.0 / jnp.sqrt(3.0))
    half = -dirs + light
    half = half / jnp.linalg.norm(half, axis=-1, keepdims=True)

    cd = dirs @ origin  # cam . dir per ray (look-ahead range quirk)
    c2 = jnp.full((dirs.shape[0],), jnp.sum(origin * origin))

    r = dirs.shape[0]
    feats = jnp.zeros((N_FEATURES, r), jnp.float32)
    for i, v in zip(
        range(15),
        (rs, rb, cs, cb, ts, tb, entry, exit_, aexp, signok,
         half[:, 0], half[:, 1], half[:, 2], cd, c2),
    ):
        feats = feats.at[i].set(v)
    return feats


def _forward_call(params: RenderParams, sign: int, vol_perm, lut, feats, imp_perm=None, grad_perm=None, win_rows=0, ahead=None, knobs=None, emit_density=False, pairs=(), dens_pair=None):
    """The raw forward pallas_call: (C, 16, R) feats -> (C, 4, R) rgba.

    ``ahead``: (C, n_slabs, 1, R) look-ahead bits from
    :func:`volym_tpu.ops.lookahead_kernel.lookahead_call` (enables the
    importance-driven skip; requires ``imp_perm``).

    ``knobs``: (1, 2) f32 ``[[density_threshold, early_termination_alpha]]``
    traveling TRACED (SMEM scalars in the kernel, traced comparisons in the
    occupancy/meta precompute) so slider sweeps reuse one compilation —
    ``None`` builds it from the params floats (static call sites).

    ``emit_density``: additionally return the per-step sampled density
    (C, n_slabs, 1, R) — the stored-density residual the backward replay
    loads instead of re-contracting the volume slice against the hats
    (drops the replay's density matmul AND its volume-slice streaming;
    skipped steps publish exactly 0.0, which the threshold mask turns into
    exactly no contribution).  f32 so the replayed masks are bit-identical
    to the forward's."""
    if knobs is None:
        knobs = params.knobs()
    thr = knobs[0, 0]
    n_chunks = feats.shape[0]
    if dens_pair is None:
        # decided ONCE over the whole image (all groups or none — the
        # grouped residual concatenates along its leading axis)
        dens_pair = emit_density and _dens_pair_layout(
            params, n_chunks, vol_perm.shape[0], vol_perm.shape[1],
            vol_perm.shape[2], pairs, _u8_active(params),
        )
    if n_chunks > CHUNK_GROUP:
        # Chunk grouping: the resident feats/output VMEM blocks scale with
        # the chunk count (64 KB + 16 KB per chunk), so large images run
        # as ceil(C / CHUNK_GROUP) sequential pallas calls over chunk
        # groups.  The volume streams once per GROUP — 4x at 1024²,
        # nothing next to the per-chunk streaming the inverted grid
        # replaced — and every resident-block win is preserved per group.
        outs = []
        for gi, g0 in enumerate(range(0, n_chunks, CHUNK_GROUP)):
            g1 = min(g0 + CHUNK_GROUP, n_chunks)
            outs.append(
                _forward_call(
                    params, sign, vol_perm, lut, feats[g0:g1],
                    imp_perm=imp_perm, grad_perm=grad_perm, win_rows=win_rows,
                    ahead=None if ahead is None else ahead[g0:g1],
                    knobs=knobs, emit_density=emit_density,
                    pairs=pairs[gi : gi + 1], dens_pair=dens_pair,
                )
            )
        if emit_density:
            return (
                jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0),
            )
        return jnp.concatenate(outs, axis=0)
    # u8 integer-exact streaming (see RenderParams.u8_volume): the march
    # runs in the SCALED density domain — volume as raw 0..255 integers in
    # bf16 (exact), threshold knob x255, TF coordinate scale ln/255.  The
    # sampling matmul then runs single-pass (kernel_dot's bf16 path);
    # Gaussian smoothing's stencil is linear + scale-invariantly
    # normalised, so it runs in the scaled domain unchanged (see
    # _u8_active for the real exclusions).  (Placed after the chunk-group
    # recursion so groups receive the UNSCALED operands.)
    u8 = _u8_active(params)
    if u8:
        knobs = knobs * jnp.asarray([[255.0, 1.0]], jnp.float32)
        thr = knobs[0, 0]
        # round() recovers the exact integers from the f32 v/255 volume
        # (contract: u8-representable); occupancy below uses the SAME
        # scaled values/threshold, so its block gate can never skip a
        # sample the kernel's scaled mask would have taken
        vol_perm = jnp.round(vol_perm * 255.0)
        # NOTE the gradient field stays f32: gradient_volume's 0.01-offset
        # taps blend neighbours with a NON-dyadic (0.44, 0.56) weight, so
        # the field values are not exactly bf16-representable — only the
        # density stream takes the u8 fast path (the shading chain is
        # scale-invariant either way, and its matmuls keep the exact
        # 2-pass split).
    n_slabs, nr, nc = vol_perm.shape
    coloring = params.use_importance_coloring
    lookahead = ahead is not None
    shading = params.use_shading
    smoothing = params.use_gaussian_smoothing
    # smoothing mixes values across slabs, so its skip uses the DILATED
    # occupancy grid + widened footprint margin (occupancy_grid_smooth)
    occupancy = nr % OCC_BLOCK == 0 and nc % OCC_BLOCK == 0
    # the gradient block is 3x the slice size (and smoothing streams 3
    # slice blocks); cap the batch so the double-buffered blocks fit VMEM.
    # Smoothing NEEDS sb > SMOOTH_HALO: the stencil reads halo rows
    # sb+off (off in [-HALO, -1]) from the previous block, so a smaller
    # batch would index out of range.
    # one batch size everywhere: the VMEM cost of the shaded/smoothed
    # blocks at sb=8 fits under the raised cap (vmem_params), and fewer
    # grid iterations amortise the per-iteration scaffold
    sb = SLAB_BATCH
    if n_slabs % sb:
        sb = 1
    if smoothing and sb <= SMOOTH_HALO:
        raise NotImplementedError(
            "Pallas Gaussian smoothing needs the slab count divisible by "
            f"8 (got {n_slabs}); use the jnp slab renderer or pad the grid"
        )
    if smoothing and n_slabs * 0.01 > SMOOTH_HALO:
        # same stencil-reach bound as render/slab.py smoothed_densities:
        # tap offset |u| <= GAUSSIAN_KERNEL_SIZE*GAUSSIAN_STEP*N = 0.01*N
        # march indices must fit the +-SMOOTH_HALO rows the kernel streams
        raise NotImplementedError(
            f"Gaussian smoothing stencil (halo {SMOOTH_HALO}) only covers "
            f"volumes up to {int(SMOOTH_HALO / 0.01)} slabs (got {n_slabs})"
        )
    n_blocks = n_slabs // sb
    inverted = n_chunks >= INVERT_MIN_CHUNKS
    # compacted live-pair grid (build_pairs/pair_buckets): needs the
    # inverted regime's chunk count (same slice-streaming argument) and a
    # host-derived static bucket smaller than the full grid
    n_pairs = int(pairs[0]) if pairs else 0
    compact = COMPACT and inverted and 0 < n_pairs < n_blocks * n_chunks
    win_cols = window_cols(nc, smoothing, heavy=shading and not params.fast_math)
    kernel = partial(
        _march_kernel,
        num_steps=n_slabs,
        bilinear=params.interpolation == Interpolation.TRILINEAR,
        coloring=coloring,
        shading=shading,
        precision=(
            jax.lax.Precision.DEFAULT if params.fast_math else jax.lax.Precision.HIGHEST
        ),
        win_rows=win_rows,
        win_cols=win_cols,
        slab_batch=sb,
        subtexel=params.subtexel_bits,
        march_sign=sign,
        occupancy=occupancy,
        lookahead=lookahead,
        smoothing=smoothing,
        inverted=inverted,
        first_hit=not (params.use_opacity or params.use_importance_coloring),
        emit_density=emit_density,
        u8=u8,
        compact=compact,
    )
    # index maps below are written in (chunk, block) order; W re-orders the
    # arguments for the inverted (slab-outer) grid, or reads (c, j) from
    # the prefetched pair table on the compacted grid
    if compact:
        W = lambda f: (lambda i, p: f(p[P_C, i], p[P_J, i]))
    else:
        W = (lambda f: (lambda j, c: f(c, j))) if inverted else (lambda f: f)
    slab_index = W(
        (lambda c, j: (j, 0, 0)) if sign > 0 else (
            lambda c, j: (n_blocks - 1 - j, 0, 0)
        )
    )
    slice_spec = pl.BlockSpec((sb, vol_perm.shape[1], vol_perm.shape[2]), slab_index)
    in_specs = [
        # whole-array resident feats: fetched ONCE per frame (constant
        # index map), indexed per chunk inside the kernel
        pl.BlockSpec(
            (n_chunks, N_FEATURES, RAYS_PER_CHUNK), W(lambda c, j: (0, 0, 0))
        ),
        slice_spec,
        pl.BlockSpec((1, 2), W(lambda c, j: (0, 0)), memory_space=pltpu.SMEM),
    ]
    vol_stream = vol_perm.astype(jnp.bfloat16) if u8 else vol_perm
    inputs = [feats, vol_stream, knobs]
    if smoothing:
        # previous / next MARCH blocks (clamped at the sweep ends) for the
        # slab-axis smoothing stencil's halo rows
        if sign > 0:
            prev_index = lambda c, j: (jnp.maximum(j - 1, 0), 0, 0)
            next_index = lambda c, j: (jnp.minimum(j + 1, n_blocks - 1), 0, 0)
        else:
            prev_index = lambda c, j: (n_blocks - 1 - jnp.maximum(j - 1, 0), 0, 0)
            next_index = lambda c, j: (
                n_blocks - 1 - jnp.minimum(j + 1, n_blocks - 1), 0, 0,
            )
        # the halo streams carry the SAME (possibly u8/bf16) values as
        # the main stream — mixing f32 halos with a bf16 main stream
        # would forfeit 2/3 of the DMA win AND undercut the slice-bytes
        # VMEM budget below
        in_specs.append(
            pl.BlockSpec((sb, vol_perm.shape[1], vol_perm.shape[2]), W(prev_index))
        )
        inputs.append(vol_stream)
        in_specs.append(
            pl.BlockSpec((sb, vol_perm.shape[1], vol_perm.shape[2]), W(next_index))
        )
        inputs.append(vol_stream)
    if occupancy or win_rows or win_cols:
        occ = None
        if occupancy:
            occ = (
                occupancy_grid_smooth(vol_perm, thr)
                if smoothing
                else occupancy_grid(vol_perm, thr)
            )
        halo = SMOOTH_HALO if (smoothing and win_rows) else 0
        meta = build_step_meta(
            feats, occ, n_slabs=n_slabs, sb=sb, sign=sign, nr=nr, nc=nc,
            margin=smooth_occ_margin(nr) if smoothing else 1.0,
            win_rows=win_rows, halo=halo, win_cols=win_cols,
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, meta.shape[3]), W(lambda c, j: (c, j, 0, 0)),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(meta)
    if coloring:
        in_specs.append(slice_spec)
        inputs.append(imp_perm)
    if shading:
        grad_index = (lambda c, j: (0, j, 0, 0)) if sign > 0 else (
            lambda c, j: (0, n_blocks - 1 - j, 0, 0)
        )
        in_specs.append(
            pl.BlockSpec((3, sb, vol_perm.shape[1], vol_perm.shape[2]), W(grad_index))
        )
        inputs.append(grad_perm)
    if lookahead:
        in_specs.append(
            pl.BlockSpec((1, sb, 1, RAYS_PER_CHUNK), W(lambda c, j: (c, j, 0, 0)))
        )
        inputs.append(ahead)
    b = lut_groups(lut)
    in_specs.append(pl.BlockSpec(b.shape, W(lambda c, j: (0, 0))))
    inputs.append(b)
    # whole-array resident output: the accumulator lives in VMEM across
    # every revisit (constant index map) and is written back once at the
    # end — no per-iteration aliased HBM round trip
    out_specs = pl.BlockSpec(
        (n_chunks, 4, RAYS_PER_CHUNK), W(lambda c, j: (0, 0, 0))
    )
    out_shape = jax.ShapeDtypeStruct((n_chunks, 4, RAYS_PER_CHUNK), jnp.float32)
    if emit_density:
        dw = 4 if shading else 1  # +3 gradient-field sample rows (see body)
        if dens_pair:
            # pair-layout residual (see _dens_pair_layout): block index =
            # the sequential grid index — a statically pipelinable store,
            # written only at live pairs; the compacted replay reads it
            # with the same index map
            assert compact, "pair-layout dens requires the compacted grid"
            dens_spec = pl.BlockSpec(
                (1, sb, dw, RAYS_PER_CHUNK), lambda i, p: (i, 0, 0, 0)
            )
            dens_shape = jax.ShapeDtypeStruct(
                (n_pairs, sb, dw, RAYS_PER_CHUNK), jnp.float32
            )
        else:
            dens_spec = pl.BlockSpec(
                (1, sb, dw, RAYS_PER_CHUNK), W(lambda c, j: (c, j, 0, 0))
            )
            dens_shape = jax.ShapeDtypeStruct(
                (n_chunks, n_slabs, dw, RAYS_PER_CHUNK), jnp.float32
            )
        out_specs = [out_specs, dens_spec]
        out_shape = [out_shape, dens_shape]
    compiler_params = vmem_params(
        smoothing or shading,
        resident_bytes=n_chunks * (N_FEATURES + 4) * RAYS_PER_CHUNK * 4,
        slice_bytes=sb * vol_perm.shape[1] * vol_perm.shape[2] * (2 if u8 else 4),
        n_streams=(3 if smoothing else 1) + (3 if shading else 0)
        + (1 if coloring else 0),
    )
    if compact:
        pair_tab, chunk_visited, overflow = build_pairs(
            feats, n_slabs, sb, n_pairs
        )
        res = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_pairs,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            compiler_params=compiler_params,
        )(pair_tab, *inputs)
        out = res[0] if emit_density else res
        # never-visited chunks' resident VMEM blocks are uninitialised
        # (their golden output is exactly zero: no active ray anywhere);
        # a bucket overflow poisons the frame loudly (see build_pairs)
        out = jnp.where(chunk_visited[:, None, None], out, 0.0)
        out = _poison_on_overflow(out, overflow)
        return (out, res[1]) if emit_density else out
    res = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks) if inverted else (n_chunks, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=compiler_params,
    )(*inputs)
    return tuple(res) if emit_density else res


def vmem_params(heavy: bool, resident_bytes: int = 0, slice_bytes: int = 0, n_streams: int = 1):
    """Compiler params for the slab kernels.  The smoothing+shading combo
    at 256^3 streams 3 double-buffered slice blocks plus the 3-channel
    gradient block (~17 MB scoped VMEM) — above Mosaic's 16 MB default
    scoped limit but well within the chip's physical VMEM (128 MB on
    v5e); raise the cap only when needed so every other mode keeps the
    default working set.  ``resident_bytes``: the whole-array resident
    blocks (feats/output/backward state), which scale with the chunk
    count — the cap grows with them (chunk grouping bounds the total).
    ``slice_bytes``: ONE streamed slice block and ``n_streams`` how many
    ride the grid (1 plain; 3 under smoothing's prev/cur/next; +3 more
    for the shading gradient block) — the cap budgets double buffering
    for them beyond the 256^3 sizes the base figure assumes (a 512^3
    slab block is 8 MB; without this the forward OOMs scoped vmem at
    512^3)."""
    base = (48 if heavy else 16) * 1024 * 1024
    # full double-buffered budget for the streamed blocks (no baseline
    # subtraction: Mosaic's own accounting already runs above the naive
    # sum, and the clamp below bounds the total at the chip's VMEM)
    extra_slices = 2 * n_streams * slice_bytes
    limit = base + resident_bytes + extra_slices
    if resident_bytes == 0 and not heavy and slice_bytes <= 2 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(limit, _vmem_cap_bytes())
    )


def _vmem_cap_bytes() -> int:
    """Ceiling for scoped-VMEM requests: the chip's physical VMEM minus
    ~2 MB of headroom for Mosaic's own scratch.  Sized for the deploy
    target's 128 MB (TPU v4/v5e/v5p class); earlier generations with
    smaller VMEM (v2/v3: 16 MB class) would fail AT COMPILE TIME on the
    512^3 configs that need the raised cap — override with
    VOLYM_VMEM_MB for such chips (the kernels then fall back to their
    smaller-working-set paths or refuse the config loudly)."""
    mb = int(__import__("os").environ.get("VOLYM_VMEM_MB", "128"))
    return (mb - 2) * 1024 * 1024


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def march_pallas(params: RenderParams, major: int, sign: int, win_rows: int, pairs, vol_perm, lut, feats, knobs):
    """Differentiable Pallas slab march (chunked layout).

    Gradients w.r.t. the permuted volume, the LUT, AND the packed feats
    (-> camera pose, via autodiff of the jnp ``_pack_features`` chain)
    through the two-pass backward kernels
    (:mod:`volym_tpu.ops.slab_bwd_kernel`).  ``win_rows`` is the static
    per-camera y-window size (:func:`window_rows`; 0 = full slices);
    ``pairs`` the static per-group live-pair buckets for the compacted
    grid (:func:`pair_buckets`; ``()`` = full grid).
    ``knobs`` is the traced (1, 2) [threshold, early-alpha] vector (see
    :func:`_forward_call`); its cotangent is zero (both appear only in
    comparison masks, zero-gradient a.e.).
    """
    return _forward_call(
        params, sign, vol_perm, lut, feats, win_rows=win_rows, knobs=knobs,
        pairs=pairs,
    )


#: HBM budget for the stored-density residual (MB).  The residual is f32
#: (C, n_slabs, 1, R) held from forward to backward: 67 MB at 256^2 /
#: 256 slabs, ~1 GB at 1024^2/256, ~2 GB at 1024^2/512.  Above the
#: budget the replay recomputes instead (bit-identical results, measured
#: slower) — mirroring the fused-backward working-set gate — so huge
#: frames cannot silently pin gigabytes across the whole backward.
STORE_DENSITY_BUDGET_MB = int(
    __import__("os").environ.get("VOLYM_STORE_DENSITY_BUDGET_MB", "1536")
)


def _u8_active(params) -> bool:
    """Whether the integer-exact u8 streaming path applies (see
    RenderParams.u8_volume).  Must be evaluated IDENTICALLY by the forward
    and the backward (the replay reproduces the forward's scaled-domain
    masks bit-for-bit): excluded under camera cotangents (dhat chains
    read f32 slices) and un-snapped trilinear hats (the single-pass
    contraction needs bf16-exact weights).  Gaussian smoothing IS
    covered: the stencil is a linear combination with scale-invariant
    normalisation (total/wsum), so the smoothed scaled density is
    exactly 255x the smoothed density and every consumer (threshold
    x255, TF dscale, dilated occupancy, dd stencil transpose) is
    already scale-consistent.  Callers additionally clear the flag for
    resampled slab ladders (lerped planes are not u8-representable)."""
    from volym_tpu.config import Interpolation

    return bool(
        params.u8_volume
        and not params.camera_grads
        and (
            params.subtexel_bits > 0
            or params.interpolation != Interpolation.TRILINEAR
        )
    )


def _use_stored_density(params, feats=None, n_slabs=None, vol_perm=None, pairs=()):
    """Stored-density backward applies (see STORE_DENSITY) whenever camera
    cotangents are off: their dhat chain needs the volume slice and the
    density colvals anyway (and, under smoothing, the d/dF_TS tap-offset
    rows).  With Gaussian smoothing the stored value is the SMOOTHED
    density, which lets the replay skip the whole sb+2·halo-row stencil
    prologue (the scatter's stencil transpose runs outside the kernel on
    dd and never needed the slices).  When the caller passes the chunked
    feats + slab count, the residual is also size-gated against
    :data:`STORE_DENSITY_BUDGET_MB` — at its PAIR-layout size when the
    compacted grid would store it that way (:func:`_dens_pair_layout`:
    ~the live fraction of the chunk layout, which keeps big frames under
    the budget that the dense layout would blow)."""
    if not (STORE_DENSITY and not params.camera_grads):
        return False
    if feats is not None and n_slabs is not None:
        width = 4 if params.use_shading else 1  # +3 stored g-sample rows
        sb = SLAB_BATCH if int(n_slabs) % SLAB_BATCH == 0 else 1
        if vol_perm is not None and _dens_pair_layout(
            params, feats.shape[0], int(n_slabs), vol_perm.shape[1],
            vol_perm.shape[2], pairs, _u8_active(params),
        ):
            resid = sum(int(p) for p in pairs) * sb * RAYS_PER_CHUNK * 4 * width
        else:
            resid = feats.shape[0] * int(n_slabs) * RAYS_PER_CHUNK * 4 * width
        if resid > STORE_DENSITY_BUDGET_MB * 1024 * 1024:
            return False
    return True


def _mp_fwd(params, major, sign, win_rows, pairs, vol_perm, lut, feats, knobs):
    stored = _use_stored_density(params, feats, vol_perm.shape[0], vol_perm, pairs)
    res = _forward_call(
        params, sign, vol_perm, lut, feats, win_rows=win_rows, knobs=knobs,
        emit_density=stored, pairs=pairs,
    )
    out, dens = res if stored else (res, None)
    return out, (vol_perm, lut, feats, out, knobs, dens)


def _mp_bwd(params, major, sign, win_rows, pairs, res, g):
    from volym_tpu.ops import slab_bwd_kernel

    vol_perm, lut, feats, out, knobs, dens = res
    d_vol, d_lut, d_feats = slab_bwd_kernel.backward(
        params, major, sign, vol_perm, lut, feats, out, g, win_rows=win_rows,
        knobs=knobs, dens=dens, pairs=pairs,
    )
    return d_vol, d_lut, d_feats, jnp.zeros_like(knobs)


march_pallas.defvjp(_mp_fwd, _mp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def march_pallas_lookahead(params, major, sign, win_rows, pairs, vol_perm, imp_perm, lut, feats, ahead, grad_perm, knobs):
    """Differentiable Pallas slab march with the importance-driven
    look-ahead gate (straight or cone — the gate semantics live in the
    precomputed ``ahead`` bits from
    :func:`volym_tpu.ops.lookahead_kernel.lookahead_call`), optionally
    Blinn-Phong shaded (``grad_perm`` non-None).

    The gate is built purely from comparisons, so it is a zero-gradient
    mask a.e. — exactly how autodiff of the jnp slab golden treats it
    (``render/slab.py:march_slabs_diff``).  Gradients flow w.r.t. the
    volume, LUT, feats (-> camera) and the gradient field through the
    gated samples; the importance grid and the ahead bits get zero
    cotangents."""
    return _forward_call(
        params, sign, vol_perm, lut, feats, imp_perm=imp_perm,
        grad_perm=grad_perm, win_rows=win_rows, ahead=ahead, knobs=knobs,
        pairs=pairs,
    )


def _mpl_fwd(params, major, sign, win_rows, pairs, vol_perm, imp_perm, lut, feats, ahead, grad_perm, knobs):
    stored = _use_stored_density(params, feats, vol_perm.shape[0], vol_perm, pairs)
    res = _forward_call(
        params, sign, vol_perm, lut, feats, imp_perm=imp_perm,
        grad_perm=grad_perm, win_rows=win_rows, ahead=ahead, knobs=knobs,
        emit_density=stored, pairs=pairs,
    )
    out, dens = res if stored else (res, None)
    return out, (
        vol_perm, imp_perm, lut, feats, ahead, grad_perm, out, knobs, dens,
    )


def _mpl_bwd(params, major, sign, win_rows, pairs, res, g):
    from volym_tpu.ops import slab_bwd_kernel

    vol_perm, imp_perm, lut, feats, ahead, grad_perm, out, knobs, dens = res
    if grad_perm is None:
        d_vol, d_lut, d_feats = slab_bwd_kernel.backward(
            params, major, sign, vol_perm, lut, feats, out, g,
            win_rows=win_rows, imp_perm=imp_perm, ahead=ahead, knobs=knobs,
            dens=dens, pairs=pairs,
        )
        d_grad = None
    else:
        d_vol, d_grad, d_lut, d_feats = slab_bwd_kernel.backward_shaded(
            params, major, sign, vol_perm, grad_perm, lut, feats, out, g,
            win_rows=win_rows, imp_perm=imp_perm, ahead=ahead, knobs=knobs,
            dens=dens, pairs=pairs,
        )
    return (
        d_vol, jnp.zeros_like(imp_perm), d_lut, d_feats,
        jnp.zeros_like(ahead), d_grad, jnp.zeros_like(knobs),
    )


march_pallas_lookahead.defvjp(_mpl_fwd, _mpl_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def march_pallas_shaded(params, major, sign, win_rows, pairs, vol_perm, grad_perm, lut, feats, knobs):
    """Differentiable Pallas slab march, Blinn-Phong-shaded mode.

    Gradients w.r.t. the permuted volume, the precomputed gradient field
    (-> the volume again through the jnp :func:`slab.gradient_volume`
    chain outside), the LUT, and the feats (-> camera, incl. the
    half-vector rows)."""
    return _forward_call(
        params, sign, vol_perm, lut, feats, grad_perm=grad_perm,
        win_rows=win_rows, knobs=knobs, pairs=pairs,
    )


def _mps_fwd(params, major, sign, win_rows, pairs, vol_perm, grad_perm, lut, feats, knobs):
    stored = _use_stored_density(params, feats, vol_perm.shape[0], vol_perm, pairs)
    res = _forward_call(
        params, sign, vol_perm, lut, feats, grad_perm=grad_perm,
        win_rows=win_rows, knobs=knobs, emit_density=stored, pairs=pairs,
    )
    out, dens = res if stored else (res, None)
    return out, (vol_perm, grad_perm, lut, feats, out, knobs, dens)


def _mps_bwd(params, major, sign, win_rows, pairs, res, g):
    from volym_tpu.ops import slab_bwd_kernel

    vol_perm, grad_perm, lut, feats, out, knobs, dens = res
    d_vol, d_grad, d_lut, d_feats = slab_bwd_kernel.backward_shaded(
        params, major, sign, vol_perm, grad_perm, lut, feats, out, g,
        win_rows=win_rows, knobs=knobs, dens=dens, pairs=pairs,
    )
    return d_vol, d_grad, d_lut, d_feats, jnp.zeros_like(knobs)


march_pallas_shaded.defvjp(_mps_fwd, _mps_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def march_pallas_coloring(params, major, sign, win_rows, pairs, vol_perm, imp_perm, feats, grad_perm, knobs):
    """Differentiable Pallas slab march, importance-coloring mode —
    optionally Blinn-Phong shaded (``grad_perm`` non-None: the combined
    coloring+shading mode).

    Gradients w.r.t. the (box-filtered) importance grid, the feats
    (-> camera, incl. half-vector rows when shaded), and — when shaded —
    the gradient field (-> the volume through the jnp
    :func:`slab.gradient_volume` chain outside); the direct volume/LUT
    gradients are zero a.e. (density only gates the threshold mask),
    matching autodiff of the jnp slab golden.
    """
    return _forward_call(
        params, sign, vol_perm, jnp.zeros((256, 4), jnp.float32), feats,
        imp_perm=imp_perm, grad_perm=grad_perm, win_rows=win_rows,
        knobs=knobs, pairs=pairs,
    )


def _mpc_fwd(params, major, sign, win_rows, pairs, vol_perm, imp_perm, feats, grad_perm, knobs):
    stored = _use_stored_density(params, feats, vol_perm.shape[0], vol_perm, pairs)
    res = _forward_call(
        params, sign, vol_perm, jnp.zeros((256, 4), jnp.float32), feats,
        imp_perm=imp_perm, grad_perm=grad_perm, win_rows=win_rows,
        knobs=knobs, emit_density=stored, pairs=pairs,
    )
    out, dens = res if stored else (res, None)
    return out, (vol_perm, imp_perm, feats, grad_perm, out, knobs, dens)


def _mpc_bwd(params, major, sign, win_rows, pairs, res, g):
    from volym_tpu.ops import slab_bwd_kernel

    vol_perm, imp_perm, feats, grad_perm, out, knobs, dens = res
    if grad_perm is None:
        d_imp, d_feats = slab_bwd_kernel.backward_coloring(
            params, major, sign, vol_perm, imp_perm, feats, out, g,
            win_rows=win_rows, knobs=knobs, dens=dens, pairs=pairs,
        )
        d_grad = None
    else:
        d_imp, d_grad, d_feats = slab_bwd_kernel.backward_coloring(
            params, major, sign, vol_perm, imp_perm, feats, out, g,
            win_rows=win_rows, grad_perm=grad_perm, knobs=knobs, dens=dens,
            pairs=pairs,
        )
    return jnp.zeros_like(vol_perm), d_imp, d_feats, d_grad, jnp.zeros_like(knobs)


march_pallas_coloring.defvjp(_mpc_fwd, _mpc_bwd)


_win_cache: dict = {}


def window_rows(camera_matrices, height, width, n_slabs, major, sign, halo=0, n_plane=None) -> int:
    """Host-side (pure numpy, no device work) static window size for the
    windowed y contraction: the smallest multiple-of-8 window that covers
    every 32x32-pixel tile's slab-rows footprint, checked per slab exactly
    as the kernel places its window (clamped rows over the rays active at
    that slab).  ``halo`` (= SMOOTH_HALO under Gaussian smoothing) widens
    the per-ray activity interval by halo*|ts| exactly as the kernel's
    window placement does (build_step_meta), so the static size covers
    every ray whose smoothing stencil reads a given slab's plain row.
    Returns 0 (contract full slices) when the image does not tile or no
    window smaller than the slice exists."""
    if height % TILE or width % TILE_W:
        return 0
    n_plane = n_slabs if n_plane is None else n_plane
    key = (
        np.asarray(camera_matrices.inverse_view_proj).tobytes(),
        np.asarray(camera_matrices.position).tobytes(),
        height, width, n_slabs, major, sign, halo, n_plane,
    )
    if key in _win_cache:
        return _win_cache[key]
    _, row_comp, _ = slab_mod._AXIS_LAYOUT[major]
    ivp = np.asarray(camera_matrices.inverse_view_proj, np.float32)
    cam = np.asarray(camera_matrices.position, np.float32)

    xs = np.arange(width, dtype=np.float32) / width * 2.0 - 1.0
    ys = 1.0 - np.arange(height, dtype=np.float32) / height * 2.0
    u, v = np.meshgrid(xs, ys, indexing="xy")
    world = (
        u[..., None] * ivp[:, 0] + v[..., None] * ivp[:, 1] + ivp[:, 3]
    )  # (H, W, 4)
    pos = world[..., :3] / world[..., 3:4]
    d = pos - cam
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.reshape(-1, 3)

    d_m = d[:, major]
    sign_ok = (d_m * sign) > 0
    safe_dm = np.where(np.abs(d_m) > 1e-12, d_m, 1e-12)
    sz = (1.0 / n_slabs) * sign
    z0 = (0.5 / n_slabs) if sign > 0 else ((n_slabs - 0.5) / n_slabs)
    ts = sz / safe_dm
    tb = (z0 - cam[major]) / safe_dm
    rs = ts * d[:, row_comp] * n_plane
    rb = (cam[row_comp] + tb * d[:, row_comp]) * n_plane - 0.5
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (0.0 - cam) / d
        t2 = (1.0 - cam) / d
    entry = np.maximum(np.max(np.minimum(t1, t2), axis=-1), 0.0)
    exit_ = np.maximum(np.min(np.maximum(t1, t2), axis=-1), 0.0)

    order = np.asarray(_tile_order(height, width))
    rs, rb = rs[order], rb[order]
    ts_o, tb_o = ts[order], tb[order]
    sign_ok, entry, exit_ = sign_ok[order], entry[order], exit_[order]
    n_tiles = rs.size // RAYS_PER_CHUNK
    shape = (n_tiles, RAYS_PER_CHUNK)
    rs, rb = rs.reshape(shape), rb.reshape(shape)
    ts_o, tb_o = ts_o.reshape(shape), tb_o.reshape(shape)
    sign_ok, entry, exit_ = sign_ok.reshape(shape), entry.reshape(shape), exit_.reshape(shape)
    # exact spread mirroring the kernel: per slab, the clamped-rows spread
    # over the rays ACTIVE at that slab (correct sign, t inside [entry,
    # exit)) — inactive rays are masked out of the compositing.
    # Vectorised over all slabs at once (a python loop here was ~50 ms per
    # new camera at 256³ — visible in an orbit sweep).
    # Certified interval bound instead of a per-slab scan: rows(j) is
    # monotone affine in j per ray, and a correctly-signed ray's t(j) is
    # increasing (ts > 0 when sign_ok), so each ray's ACTIVE j-range is
    # one interval [ja, jb].  Per 8-slab fence interval, intersect with
    # the ray's own active range and evaluate the clamped rows at the two
    # intersected endpoints — the exact per-ray extremes over its active
    # positions in the interval.  The tile bound max-minus-min over those
    # extremes covers every per-slab spread in the interval (loose only
    # by the within-interval motion when max- and min-rays peak at
    # different j — at most 2*8*|rs| rows, absorbed by WIN_SLACK plus the
    # ladder headroom).  32 interval evals replace 256 per-slab evals
    # (~8x less host work per new camera).
    slack = np.abs(ts_o) * float(halo)
    big, small = np.float32(-1e30), np.float32(1e30)
    ent_s, exi_s = entry - slack, exit_ + slack
    with np.errstate(divide="ignore", invalid="ignore"):
        ja = (ent_s - tb_o) / ts_o
        jb = (exi_s - tb_o) / ts_o
    bounds = []
    for j0 in range(0, n_slabs, 8):
        j1 = min(j0 + 8, n_slabs - 1)
        ea = np.maximum(np.float32(j0), ja)
        eb = np.minimum(np.float32(j1), jb)
        act = sign_ok & (ea <= eb)
        ra = np.clip(rs * ea + rb, 0.0, n_plane - 1.0)
        rb_ = np.clip(rs * eb + rb, 0.0, n_plane - 1.0)
        rmax = np.max(np.where(act, np.maximum(ra, rb_), big), axis=1)
        rmin = np.min(np.where(act, np.minimum(ra, rb_), small), axis=1)
        bounds.append((float(np.max(rmax - rmin)), j0, j1))
    # Refine to the EXACT per-slab worst, largest-bound intervals first,
    # stopping once no remaining interval bound can raise the running
    # exact max — typically 1-3 intervals (~10 slab evals) instead of 256,
    # and never looser than the exhaustive scan (bucket boundaries are
    # tight: the bench camera sits ~1 row under a ladder step).
    worst = 0.0
    for b, j0, j1 in sorted(bounds, reverse=True):
        if b <= worst:
            break
        for j in range(j0, j1 + 1):
            t_j = ts_o * np.float32(j) + tb_o
            act = sign_ok & (t_j >= ent_s) & (t_j < exi_s)
            rows = np.clip(rs * np.float32(j) + rb, 0.0, n_plane - 1.0)
            sp = np.max(np.where(act, rows, big), axis=1) - np.min(
                np.where(act, rows, small), axis=1
            )
            worst = max(worst, float(np.max(sp)))
    worst = max(0.0, worst)
    win = max(MIN_WIN_ROWS, int(np.ceil((worst + WIN_SLACK) / 8.0)) * 8)
    # Bucket to a fixed ladder so an orbit sweep reuses a handful of jit
    # keys instead of minting a new (win_rows, major, sign) compilation per
    # camera pose (VERDICT r3: production-path interactivity).
    win = bucket_window(win, n_plane)
    if len(_win_cache) > 256:
        _win_cache.clear()
    _win_cache[key] = win
    return win


#: fixed ladder of static y-window sizes: every camera maps onto one of
#: these (or 0 = full slices), bounding the number of Mosaic compilations
#: an orbit sweep can mint to |ladder| per (major, sign).  The 256/384
#: steps only apply to >256-slab grids (bucket_window requires w <
#: n_slabs): at 512^3 the bench camera's tight window is 248 rows, so
#: 256 halves the y contraction that previously ran full-width there.
WIN_LADDER = (32, 64, 128, 192, 256, 384)


def bucket_window(win: int, n_slabs: int) -> int:
    """Smallest ladder window >= ``win`` that is still smaller than the
    slice; 0 (full slices) when none fits."""
    for w in WIN_LADDER:
        if w >= win and w < n_slabs:
            return w
    return 0


_pair_cache: dict = {}


def pair_buckets(camera_matrices, height, width, n_slabs, major, sign):
    """Host-side (pure numpy) static live-pair bucket per chunk group, for
    the compacted grid (:func:`build_pairs`).

    Counts, per chunk group, the (chunk, march-block) pairs with any
    geometrically active ray — the same per-ray affine activity the
    kernels' feats encode (``t(j) = ts*j + tb`` inside ``[entry, exit)``
    with the correct sign; math identical to :func:`window_rows`'s numpy
    replica of :func:`_pack_features`) — with each ray's active j-interval
    widened by ±1 slab so TPU-vs-host float wobble can never flip a
    boundary pair out of the bound (build_pairs NaN-poisons the frame on
    overflow rather than dropping work; the widening makes that
    unreachable).  Adds ``n_blocks`` headroom for the dead-block pads,
    then rounds up to a coarse ladder (multiples of total/8) so an orbit
    sweep mints a handful of jit keys, mirroring :func:`bucket_window`.

    Returns a tuple with one bucket per CHUNK_GROUP chunk group (the
    grouped calls compact independently); an entry is 0 (= compaction
    off) when the group's bucket would not beat the full grid.  Returns
    ``()`` when the image does not tile or compaction is disabled.
    """
    if not COMPACT or height % TILE or width % TILE_W:
        return ()
    key = (
        np.asarray(camera_matrices.inverse_view_proj).tobytes(),
        np.asarray(camera_matrices.position).tobytes(),
        height, width, n_slabs, major, sign,
    )
    if key in _pair_cache:
        return _pair_cache[key]
    sb = SLAB_BATCH if n_slabs % SLAB_BATCH == 0 else 1
    nb = n_slabs // sb
    live = _host_pair_live(camera_matrices, height, width, n_slabs, major, sign, sb)
    n_chunks = live.shape[0]
    quantum = max(128, (nb * min(n_chunks, CHUNK_GROUP)) // 8)
    out = []
    for g0 in range(0, n_chunks, CHUNK_GROUP):
        g = live[g0 : g0 + CHUNK_GROUP]
        total = nb * g.shape[0]
        n = int(g.sum()) + nb  # + dead-block pad headroom
        bucket = -(-n // quantum) * quantum
        # a near-full bucket can't beat the full grid's simpler scaffold
        out.append(bucket if bucket <= 0.9 * total else 0)
    res = tuple(out)
    if len(_pair_cache) > 256:
        _pair_cache.clear()
    _pair_cache[key] = res
    return res


def _host_pair_live(camera_matrices, height, width, n_slabs, major, sign, sb):
    """(C, NB) conservative geometric pair liveness, pure numpy (see
    :func:`pair_buckets`): each ray's active march interval, widened by
    ±1 slab against TPU-vs-host float wobble, intersected with each
    block's step range.  A strict superset of the kernels' exact activity
    (tests/test_compact_pairs.py pins the containment on swept cameras)."""
    nb = n_slabs // sb
    _, row_comp, _ = slab_mod._AXIS_LAYOUT[major]
    ivp = np.asarray(camera_matrices.inverse_view_proj, np.float32)
    cam = np.asarray(camera_matrices.position, np.float32)

    xs = np.arange(width, dtype=np.float32) / width * 2.0 - 1.0
    ys = 1.0 - np.arange(height, dtype=np.float32) / height * 2.0
    u, v = np.meshgrid(xs, ys, indexing="xy")
    world = u[..., None] * ivp[:, 0] + v[..., None] * ivp[:, 1] + ivp[:, 3]
    pos = world[..., :3] / world[..., 3:4]
    d = pos - cam
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.reshape(-1, 3)
    d_m = d[:, major]
    sign_ok = (d_m * sign) > 0
    safe_dm = np.where(np.abs(d_m) > 1e-12, d_m, 1e-12)
    sz = (1.0 / n_slabs) * sign
    z0 = (0.5 / n_slabs) if sign > 0 else ((n_slabs - 0.5) / n_slabs)
    ts = sz / safe_dm
    tb = (z0 - cam[major]) / safe_dm
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (0.0 - cam) / d
        t2 = (1.0 - cam) / d
    entry = np.maximum(np.max(np.minimum(t1, t2), axis=-1), 0.0)
    exit_ = np.maximum(np.min(np.maximum(t1, t2), axis=-1), 0.0)

    order = np.asarray(_tile_order(height, width))
    shape = (-1, RAYS_PER_CHUNK)
    ts_o, tb_o = ts[order].reshape(shape), tb[order].reshape(shape)
    sign_ok = sign_ok[order].reshape(shape)
    entry, exit_ = entry[order].reshape(shape), exit_[order].reshape(shape)
    # per-ray active march interval: a correctly-signed ray has ts > 0, so
    # t(j) in [entry, exit) <=> j in [ja, jb); widen by +-1 slab
    with np.errstate(divide="ignore", invalid="ignore"):
        ja = (entry - tb_o) / ts_o - 1.0
        jb = (exit_ - tb_o) / ts_o + 1.0
    blk_lo = (np.arange(nb, dtype=np.float32) * sb)[None, :, None]
    blk_hi = blk_lo + (sb - 1)
    return (
        sign_ok[:, None, :]
        & (ja[:, None, :] <= blk_hi)
        & (jb[:, None, :] >= blk_lo)
    ).any(axis=2)  # (C, NB)


def _tile_order(height, width):
    """Ray permutation putting each TILE x TILE pixel tile contiguous, so a
    chunk's slab footprint is compact in both axes (the windowed
    contraction's fits-condition).  None when the image doesn't tile."""
    if height % TILE or width % TILE_W:
        return None
    idx = np.arange(height * width).reshape(
        height // TILE, TILE, width // TILE_W, TILE_W
    )
    return idx.transpose(0, 2, 1, 3).reshape(-1)


def _perm_gather(x, order, axis=0):
    """Gather by a STATIC permutation whose VJP is the inverse-permutation
    gather.  Autodiff's generic transpose of ``x[order]`` is a scatter-add
    (sort + scatter, ~1 ms/frame of XLA glue in the 256^2 backward); for a
    permutation the transpose is exactly the inverse gather."""
    order = np.asarray(order)
    inv = np.argsort(order)

    @jax.custom_vjp
    def gather(x):
        return jnp.take(x, order, axis=axis)

    def fwd(x):
        return gather(x), None

    def bwd(_, ct):
        return (jnp.take(ct, inv, axis=axis),)

    gather.defvjp(fwd, bwd)
    return gather(x)


def _chunk_rays(mat, height, width):
    """(rows, R) per-ray matrix -> (C, rows, RAYS_PER_CHUNK) chunk layout
    (tile order + padding).

    The tile-order permutation is EXACTLY a reshape+transpose (it was
    built from one — :func:`_tile_order`), so it runs as a layout copy at
    full HBM bandwidth instead of an index gather: jnp.take on this TPU
    crawls at ~100 M elements/s AND stages its s32 index vector through a
    separate per-execution copy (~3 ms/frame of XLA glue at 256² in the
    profiler — the largest single non-kernel term the trace summarizer
    found).  Autodiff of a transpose is the inverse transpose, so the
    backward is equally gather-free (this also retires the _perm_gather
    custom-VJP workaround on this path)."""
    rows, r = mat.shape
    if height % TILE == 0 and width % TILE_W == 0 and r == height * width:
        m = mat.reshape(rows, height // TILE, TILE, width // TILE_W, TILE_W)
        m = m.transpose(1, 3, 0, 2, 4)  # (H/T, W/Tw, rows, T, Tw)
        return m.reshape(-1, rows, RAYS_PER_CHUNK)
    if r % RAYS_PER_CHUNK:
        pad = RAYS_PER_CHUNK - r % RAYS_PER_CHUNK
        mat = jnp.pad(mat, ((0, 0), (0, pad)))
    n_chunks = mat.shape[1] // RAYS_PER_CHUNK
    return mat.reshape(rows, n_chunks, RAYS_PER_CHUNK).transpose(1, 0, 2)


def _chunk_flat(mat):
    """(rows, R) -> (C, rows, RAYS_PER_CHUNK), row-major (no tile order) —
    for sharded shards whose ray layout is fixed by the partitioning."""
    rows, r = mat.shape
    if r % RAYS_PER_CHUNK:
        pad = RAYS_PER_CHUNK - r % RAYS_PER_CHUNK
        mat = jnp.pad(mat, ((0, 0), (0, pad)))
    n_chunks = mat.shape[1] // RAYS_PER_CHUNK
    return mat.reshape(rows, n_chunks, RAYS_PER_CHUNK).transpose(1, 0, 2)


def _unchunk_flat(out, r):
    """(C, 4, RAYS_PER_CHUNK) -> (r, 4), inverse of _chunk_flat's layout."""
    return out.transpose(0, 2, 1).reshape(-1, 4)[:r]


def _chunked_feats(camera_matrices, height, width, n_slabs, major, sign, layout, n_plane=None):
    feats, miss = _pack_features(
        camera_matrices, height, width, n_slabs, major, sign, layout,
        n_plane=n_plane,
    )
    r = feats.shape[1]
    return _chunk_rays(feats, height, width), miss, r


def _pack_cone_features(camera_matrices, height, width, n_slabs, major, sign, layout, n_plane=None):
    """Per-ray affine coefficients of the 8 cone look-ahead directions
    (camera-anchored; see ops/lookahead_kernel.py): 7 rows per direction
    (rows/cols/t slopes + intercepts, march-steps-per-distance rate)."""
    origin, dirs = rays_mod.generate_rays(camera_matrices, height, width)
    return cone_features_from_rays(
        origin, dirs, n_slabs, major, sign, layout, n_plane=n_plane
    )


def cone_features_from_rays(origin, dirs, n_slabs, major, sign, layout, n_plane=None):
    """Cone-direction coefficients from an explicit ray bundle (the
    sharded renderers build per-shard rays themselves)."""
    from volym_tpu.render.golden import cone_directions

    _, row_comp, col_comp = layout
    cdirs = cone_directions(dirs)  # (R, S, 3)
    n = n_slabs
    sz = (1.0 / n) * sign
    z0 = (0.5 / n) if sign > 0 else ((n - 0.5) / n)
    rows = []
    for c in range(cdirs.shape[-2]):
        dc = cdirs[:, c, :]
        d_m = dc[:, major]
        safe = jnp.where(jnp.abs(d_m) > 1e-12, d_m, 1e-12)
        ts = sz / safe
        tb = (z0 - origin[major]) / safe
        npl = n if n_plane is None else n_plane
        rows += [
            ts * dc[:, row_comp] * npl,
            (origin[row_comp] + tb * dc[:, row_comp]) * npl - 0.5,
            ts * dc[:, col_comp] * npl,
            (origin[col_comp] + tb * dc[:, col_comp]) * npl - 0.5,
            ts,
            tb,
            d_m * n * sign,
            jnp.zeros_like(ts),  # pad to CF_STRIDE (sublane alignment)
        ]
    return jnp.stack(rows)  # (CONE_FEATURES, R)


def _unchunk_tiled(out, r, height, width):
    """(C, ch, RAYS_PER_CHUNK) -> (r, ch) in raster order: inverse of
    :func:`_chunk_rays` (tile-order permutation undone as a pure
    reshape/transpose — see _chunk_rays; identity layout when the image
    does not tile)."""
    ch = out.shape[1]
    if height % TILE == 0 and width % TILE_W == 0 and r == height * width:
        m = out.reshape(height // TILE, width // TILE_W, ch, TILE, TILE_W)
        m = m.transpose(0, 3, 1, 4, 2)  # (H/T, T, W/Tw, Tw, ch)
        return m.reshape(r, ch)
    return out.transpose(0, 2, 1).reshape(-1, ch)[:r]


def _assemble(out, miss, r, height, width):
    img = _unchunk_tiled(out, r, height, width)
    miss_color = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    img = jnp.where(miss[:, None], miss_color[None, :], img)
    return img.reshape(height, width, 4)


@partial(
    jax.jit,
    static_argnames=(
        "params", "height", "width", "major", "sign", "win_rows", "planes",
        "pairs",
    ),
)
def _render_pallas_jit(
    scene, camera_matrices, params, height, width, major, sign, win_rows=0,
    knobs=None, planes=None, pairs=(),
):
    layout = slab_mod._AXIS_LAYOUT[major]
    vol_perm = slab_mod.permute_volume(scene.volume, major)
    n_plane = vol_perm.shape[1]
    if planes is None:
        planes = vol_perm.shape[0]
    vol_perm = slab_mod.slab_resample(vol_perm, planes)
    feats, miss, r = _chunked_feats(
        camera_matrices, height, width, planes, major, sign, layout,
        n_plane=n_plane,
    )
    lookahead = (
        params.use_importance_rendering and not params.use_importance_coloring
    )
    imp_perm = (
        slab_mod.slab_resample_nearest(
            slab_mod.permute_volume(scene.importance, major), planes
        )
        if (params.use_importance_coloring or lookahead)
        else None
    )
    grad_perm = (
        slab_mod.slab_resample_grad(
            slab_mod.permute_gradient(
                slab_mod.gradient_volume(scene.volume), major
            ),
            planes,
        )
        if params.use_shading
        else None
    )
    ahead = None
    if lookahead:
        from volym_tpu.ops import lookahead_kernel

        cone_feats = (
            _chunk_rays(
                _pack_cone_features(
                    camera_matrices, height, width, planes, major,
                    sign, layout, n_plane=n_plane,
                ),
                height,
                width,
            )
            if params.use_cone_importance_check
            else None
        )
        ahead = lookahead_kernel.lookahead_call(
            sign, imp_perm, feats, cone_feats, win_rows,
            subtexel=params.subtexel_bits,
        )
    out = _forward_call(
        params, sign, vol_perm, scene.tf_lut, feats, imp_perm, grad_perm,
        win_rows, ahead, knobs=knobs, pairs=pairs,
    )
    return _assemble(out, miss, r, height, width)


@partial(
    jax.jit,
    static_argnames=(
        "params", "height", "width", "major", "sign", "win_rows", "planes",
        "pairs",
    ),
)
def _render_pallas_diff_jit(
    scene, camera_matrices, params, height, width, major, sign, win_rows=0,
    knobs=None, planes=None, pairs=(),
):
    if knobs is None:
        knobs = params.knobs()
    layout = slab_mod._AXIS_LAYOUT[major]
    vol_perm = slab_mod.permute_volume(scene.volume, major)
    n_plane = vol_perm.shape[1]
    if planes is None:
        planes = vol_perm.shape[0]
    # step-size mapping: resample the slab axis OUTSIDE the custom-VJP
    # march, so d(vol_perm) chains back to the source volume through the
    # (differentiable) lerp automatically
    vol_perm = slab_mod.slab_resample(vol_perm, planes)
    feats, miss, r = _chunked_feats(
        camera_matrices, height, width, planes, major, sign, layout,
        n_plane=n_plane,
    )
    lookahead = (
        params.use_importance_rendering and not params.use_importance_coloring
    )

    def shaded_grad_perm():
        if not params.use_shading:
            return None
        # gradient_volume is jnp, so d(grad_perm) chains back to the volume
        gp = slab_mod.permute_gradient(slab_mod.gradient_volume(scene.volume), major)
        return slab_mod.slab_resample_grad(gp, planes)

    if params.use_importance_coloring:
        imp_perm = slab_mod.slab_resample_nearest(
            slab_mod.permute_volume(scene.importance, major), planes
        )
        grad_perm = shaded_grad_perm()
        out = march_pallas_coloring(
            params, major, sign, win_rows, pairs, vol_perm, imp_perm, feats,
            grad_perm, knobs,
        )
    elif lookahead:
        from volym_tpu.ops import lookahead_kernel

        # the ahead bits are a zero-gradient gate (pure comparisons), so
        # the pre-pass runs on stop_gradient'ed inputs — no transpose rule
        # needed for its pallas_call
        imp_perm = slab_mod.slab_resample_nearest(
            slab_mod.permute_volume(scene.importance, major), planes
        )
        sg_feats = jax.lax.stop_gradient(feats)
        cone_feats = (
            _chunk_rays(
                _pack_cone_features(
                    jax.lax.stop_gradient(camera_matrices), height, width,
                    planes, major, sign, layout, n_plane=n_plane,
                ),
                height,
                width,
            )
            if params.use_cone_importance_check
            else None
        )
        ahead = lookahead_kernel.lookahead_call(
            sign, jax.lax.stop_gradient(imp_perm), sg_feats, cone_feats,
            win_rows, subtexel=params.subtexel_bits,
        )
        grad_perm = shaded_grad_perm()
        out = march_pallas_lookahead(
            params, major, sign, win_rows, pairs, vol_perm, imp_perm,
            scene.tf_lut, feats, ahead, grad_perm, knobs,
        )
    elif params.use_shading:
        grad_perm = shaded_grad_perm()
        out = march_pallas_shaded(
            params, major, sign, win_rows, pairs, vol_perm, grad_perm,
            scene.tf_lut, feats, knobs,
        )
    else:
        out = march_pallas(
            params, major, sign, win_rows, pairs, vol_perm, scene.tf_lut,
            feats, knobs,
        )
    return _assemble(out, miss, r, height, width)


def render_diff(scene, camera_matrices, params: RenderParams, height: int, width: int):
    """Differentiable Pallas slab render: Pallas forward AND backward.

    Gradients w.r.t. the volume, TF LUT, camera matrices, the importance
    grid (importance-coloring mode), and — when shading — the Blinn-Phong
    chain (volume via the gradient field + camera half vectors).
    Importance-driven look-ahead (straight + cone) differentiates as a
    zero-gradient gate, and Gaussian smoothing chains through the
    slab-axis stencil transpose — both matching the jnp slab replay."""
    if not params.use_opacity:
        raise NotImplementedError(
            "slab kernels always alpha-composite; first-hit (use_opacity="
            "False) needs the t-step renderers"
        )
    major, sign = slab_mod.dominant_axis(camera_matrices)
    n = scene.volume.shape[0]
    planes = slab_mod.resolve_planes(params, n)
    win = window_rows(
        camera_matrices, height, width, planes, major, sign,
        halo=SMOOTH_HALO if params.use_gaussian_smoothing else 0,
        n_plane=n,
    )
    if planes != n:
        # resampled slab ladder: lerped planes are not u8-representable
        params = params.replace(u8_volume=False)
    pairs = pair_buckets(camera_matrices, height, width, planes, major, sign)
    return _render_pallas_diff_jit(
        scene, camera_matrices, params.pallas_static(), height, width, major,
        sign, win, knobs=params.knobs(), planes=planes, pairs=pairs,
    )


def render(scene, camera_matrices, params: RenderParams, height: int, width: int):
    """Pallas slab-marching render -> (H, W, 4).

    Importance-driven look-ahead (straight and cone) runs via the reverse
    pre-pass (:mod:`volym_tpu.ops.lookahead_kernel`); Gaussian smoothing
    via the batch-amortised slab-axis stencil (see _march_kernel)."""
    major, sign = slab_mod.dominant_axis(camera_matrices)
    n = scene.volume.shape[0]
    planes = slab_mod.resolve_planes(params, n)
    win = window_rows(
        camera_matrices, height, width, planes, major, sign,
        halo=SMOOTH_HALO if params.use_gaussian_smoothing else 0,
        n_plane=n,
    )
    # forward-only: camera cotangents are moot, so clear the flag (it
    # would otherwise veto the u8 fast path — _u8_active); a resampled
    # slab ladder lerps planes (not u8-representable) — clear u8 there
    params = params.replace(camera_grads=False)
    if planes != n:
        params = params.replace(u8_volume=False)
    pairs = pair_buckets(camera_matrices, height, width, planes, major, sign)
    return _render_pallas_jit(
        scene, camera_matrices, params.pallas_static(), height, width, major,
        sign, win, knobs=params.knobs(), planes=planes, pairs=pairs,
    )
