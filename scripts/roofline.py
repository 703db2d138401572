"""Roofline / MFU accounting for the base forward at 256² (VERDICT r3
item 1): executed-step count from the REAL occupancy meta, nominal MXU
FLOPs and HBM bytes per frame, against v5e peaks.

Structural numbers only (no TPU needed) — combine with the measured frame
time (scripts/_floor_map.py) for the utilization statement in BASELINE.md.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel as sk
from volym_tpu.render import slab as sm

H = W = 256
N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
scene = Scene.synthetic("bonsai", side=N)
m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()
thr = 0.15
major, sign = sm.dominant_axis(m)
layout = sm._AXIS_LAYOUT[major]
vol_perm = sm.permute_volume(scene.volume, major)
feats, miss, r = sk._chunked_feats(m, H, W, N, major, sign, layout)
win = sk.window_rows(m, H, W, N, major, sign)
wc = sk.window_cols(N, False)
occ = sk.occupancy_grid(vol_perm, thr)
meta = np.asarray(
    sk.build_step_meta(
        feats, occ, n_slabs=N, sb=sk.SLAB_BATCH, sign=sign, nr=N, nc=N,
        margin=1.0, win_rows=win, win_cols=wc,
    )
)
C = feats.shape[0]
sb = sk.SLAB_BATCH
nb = N // sb
flags = meta[:, :, 0, 1 : 1 + sb]  # (C, NB, sb)
block_occ = meta[:, :, 0, 0]
fits = meta[:, :, 0, -1]
exec_steps = int(flags.sum())
total_steps = C * N
live_blocks = int(block_occ.sum())
fit_blocks = int(((fits > 0) & (block_occ > 0)).sum())
print(f"chunks {C}, win_rows {win}, win_cols {wc}")
print(
    f"executed steps: {exec_steps}/{total_steps} ({exec_steps/total_steps:.1%});"
    f" live batches {live_blocks}/{C*nb} ({live_blocks/(C*nb):.1%}),"
    f" col-window fits {fit_blocks}/{live_blocks} ({fit_blocks/max(live_blocks,1):.1%})"
)

R = sk.RAYS_PER_CHUNK
# density y-contraction per executed step: (cols, win) x (win, R);
# win_rows == 0 (no ladder window fits, e.g. 512 slabs) contracts full
# slices
win = win or N
# density y-contraction per executed step: (cols, win) x (win, R)
fit_frac = fit_blocks / max(live_blocks, 1)
cols_eff = wc * fit_frac + N * (1 - fit_frac) if wc else N
mxu_nominal = exec_steps * 2 * cols_eff * win * R  # f32-equivalent FLOPs
tf_flops = exec_steps * 2 * (4 * 256 // 16) * 17 * R
passes = 2  # exact='b' hi/lo split: 2 bf16 MXU passes per contraction
print(
    f"density matmul nominal {mxu_nominal/1e9:.1f} GFLOP/frame "
    f"(x{passes} bf16 passes = {passes*mxu_nominal/1e9:.1f}); "
    f"TF lookup {tf_flops/1e9:.2f} GFLOP"
)
# HBM per frame: volume slices once, feats once, out once, meta, lut
vol_bytes = N * N * N * 2  # u8 path: bf16 integer stream (f32: x2)
bytes_frame = vol_bytes + (C * 16 * R + C * 4 * R) * 4 + meta.size * 4
print(f"HBM traffic: {bytes_frame/1e6:.0f} MB/frame (volume stream dominates)")
# v5e peaks
peak_bf16 = 197e12
peak_hbm = 819e9
t_mxu = passes * (mxu_nominal + tf_flops) / peak_bf16
t_hbm = bytes_frame / peak_hbm
print(
    f"speed-of-light: MXU {t_mxu*1e3:.2f} ms, HBM {t_hbm*1e3:.2f} ms "
    f"(v5e peaks {peak_bf16/1e12:.0f} TFLOP/s bf16, {peak_hbm/1e9:.0f} GB/s)"
)
print(
    "MFU at a measured frame time T: (x2-pass FLOPs / T) / peak; e.g. "
    f"T=4.5ms -> {passes*(mxu_nominal+tf_flops)/4.5e-3/peak_bf16:.1%}"
)

# ---- backward (stored-density replay, scene grads) ------------------------
# Replay per executed step: TF lookup fwd (b @ tri_o, as above), the d_lut
# accumulation p @ tri_o^T (4G x R x NI) and zd = b @ dtri_o (4G x NI x R),
# and the fused voxel-gradient scatter hat_y @ (hat_x*dd)^T
# ((win, R) x (R, nc) -> full lane width: no column window in the bwd).
# With STORE_DENSITY the replay's density re-sample matmul is GONE (the
# forward's stored (C, n_slabs, 1, R) density streams instead: 67 MB).
g4 = 4 * (256 // sk.TF_GROUP)
ni = sk.TF_GROUP + 1
scatter_nominal = exec_steps * 2 * win * N * R           # full width
dlut_nominal = exec_steps * 2 * g4 * ni * R              # p @ tri_o
zd_nominal = exec_steps * 2 * g4 * ni * R                # b @ dtri_o
tf_bwd = tf_flops                                        # replay TF fwd
# passes: scatter exact='a' -> 2; dlut unhinted x3 -> 3; zd exact='b' -> 2;
# TF fwd unhinted x3 -> 3
bwd_pass_flops = (
    2 * scatter_nominal + 3 * dlut_nominal + 2 * zd_nominal + 3 * tf_bwd
)
dens_bytes = C * N * R * 4  # stored density: written fwd, read bwd
bwd_bytes = (C * (16 + 4 + 4 + 16) * R + N * N * N + 256 * 4) * 4 + dens_bytes
t_mxu_bwd = bwd_pass_flops / peak_bf16
t_hbm_bwd = bwd_bytes / peak_hbm
print(
    f"backward: scatter {scatter_nominal/1e9:.1f} GFLOP nominal (x2 passes),"
    f" TF chain {(dlut_nominal+zd_nominal+tf_bwd)/1e9:.1f} GFLOP;"
    f" stored density {dens_bytes/1e6:.0f} MB"
)
print(
    f"backward speed-of-light: MXU {t_mxu_bwd*1e3:.2f} ms, HBM "
    f"{t_hbm_bwd*1e3:.2f} ms; fwd+bwd MXU SOL "
    f"{(t_mxu+t_mxu_bwd)*1e3:.2f} ms"
)
print(
    "fwd+bwd MFU at a measured step time T: e.g. T=11.7ms -> "
    f"{(passes*(mxu_nominal+tf_flops)+bwd_pass_flops)/11.7e-3/peak_bf16:.1%}"
)

# ---- VPU-inclusive model (VERDICT r4 item 1) ------------------------------
# The MXU-only roofline under-counts the kernels' real critical path: the
# hat BUILDS and x-contractions are elementwise VPU work proportional to
# (rows x R) per executed step, and inside one step they are data-dependent
# with the matmuls (hats feed the MXU; colvals feed the x-contraction), so
# the honest per-step cost is closer to SERIAL MXU + VPU than to their max.
# VPU peak (v5e): 4 ALUs x (8, 128) vregs x 0.94 GHz ~= 3.85e12 f32 op/s.
peak_vpu = 3.85e12
nx_eff = cols_eff  # x-lane width after the column window
# forward, per executed step (ops over R-lane rows; counts from
# _march_step_body): tri hat = sub+abs+sub+max = 4 ops/site
vpu_fwd_step = (
    4 * win * R        # hat_y build (win rows)
    + 4 * nx_eff * R   # hat_x build
    + 2 * nx_eff * R   # x contraction (mult + add)
    + 1 * win * R      # y-iota + r0 add
    + (2 + 4 + 2) * 17 * R + 2 * 16 * R + 8 * 4 * R  # TF two-level chain
    + 40 * R           # compositing / masks / opacity correction
)
vpu_fwd = exec_steps * vpu_fwd_step
t_vpu_fwd = vpu_fwd / peak_vpu
# u8 path: density matmul single-pass (integer-exact bf16)
t_mxu_u8 = (1 * mxu_nominal + passes * tf_flops) / peak_bf16
print(
    f"\nVPU-inclusive forward: VPU {vpu_fwd/1e9:.1f} G ops -> "
    f"{t_vpu_fwd*1e3:.2f} ms at {peak_vpu/1e12:.2f} T op/s; "
    f"serial SOL (u8 single-pass density): "
    f"{(t_mxu_u8 + t_vpu_fwd)*1e3:.2f} ms "
    f"(MXU {t_mxu_u8*1e3:.2f} + VPU {t_vpu_fwd*1e3:.2f})"
)
# backward replay + fused scatter, per executed step (from
# _replay_step_body): hats rebuilt (hat_y, hat_x), dtri/onehot chains,
# d_beta/d_alpha suffix chain ~60 ops, scatter pre-multiply hat_x*dd
vpu_bwd_step = (
    4 * win * R + 4 * N * R      # hat_y + FULL-width hat_x (no col window)
    + 2 * N * R                  # scatter lane pre-multiply hat_x*dd + add
    + (2 + 4 + 2 + 3) * 17 * R + 2 * 16 * R + 10 * 4 * R  # TF fwd + dtri + fold
    + 60 * R                     # compositing replay + cotangent chains
)
vpu_bwd = exec_steps * vpu_bwd_step
t_vpu_bwd = vpu_bwd / peak_vpu
t_serial = t_mxu_u8 + t_vpu_fwd + t_mxu_bwd + t_vpu_bwd
print(
    f"VPU-inclusive backward: VPU {vpu_bwd/1e9:.1f} G ops -> "
    f"{t_vpu_bwd*1e3:.2f} ms; serial SOL {(t_mxu_bwd + t_vpu_bwd)*1e3:.2f} ms"
)
print(
    f"fwd+bwd VPU-inclusive serial SOL: {t_serial*1e3:.2f} ms; "
    "utilization at a measured step time T = SOL/T, e.g. "
    f"T=10.1ms -> {t_serial/10.1e-3:.1%}"
)
