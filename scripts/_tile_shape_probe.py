"""Host-side probe: per-step footprints for RECTANGULAR ray tiles.

For candidate tile shapes (TILE_H x TILE_W, all 1024 rays/chunk) at the
bench camera, compute (pure numpy, mirrors slab_kernel.window_rows):
  * the static row-window size the windowed y contraction would need;
  * the column-window fit rate (fraction of (chunk, slab-batch) whose
    active-ray col footprint fits one aligned 128-lane window).

The density matmul is (nc, win_rows, R); the scatter (win_rows, R, nc) —
win_rows is the direct FLOP knob, so a tile shape that shrinks it at the
same chunk count is free throughput.
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from volym_tpu import Camera
from volym_tpu.render import slab as slab_mod

H = W = 256
N = 256  # slabs
SB = 8
WIN_SLACK = 10
cam = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0)
m = cam.matrices()
major, sign = slab_mod.dominant_axis(m)
_, row_comp, col_comp = slab_mod._AXIS_LAYOUT[major]
print(f"camera major={major} sign={sign} row_comp={row_comp} col_comp={col_comp}")

ivp = np.asarray(m.inverse_view_proj, np.float32)
campos = np.asarray(m.position, np.float32)
xs = np.arange(W, dtype=np.float32) / W * 2.0 - 1.0
ys = 1.0 - np.arange(H, dtype=np.float32) / H * 2.0
u, v = np.meshgrid(xs, ys, indexing="xy")
world = u[..., None] * ivp[:, 0] + v[..., None] * ivp[:, 1] + ivp[:, 3]
pos = world[..., :3] / world[..., 3:4]
d = pos - campos
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = d.reshape(-1, 3)

d_m = d[:, major]
sign_ok = (d_m * sign) > 0
safe_dm = np.where(np.abs(d_m) > 1e-12, d_m, 1e-12)
sz = (1.0 / N) * sign
z0 = (0.5 / N) if sign > 0 else ((N - 0.5) / N)
ts = sz / safe_dm
tb = (z0 - campos[major]) / safe_dm
rs = ts * d[:, row_comp] * N
rb = (campos[row_comp] + tb * d[:, row_comp]) * N - 0.5
cs = ts * d[:, col_comp] * N
cb = (campos[col_comp] + tb * d[:, col_comp]) * N - 0.5
with np.errstate(divide="ignore", invalid="ignore"):
    t1 = (0.0 - campos) / d
    t2 = (1.0 - campos) / d
entry = np.maximum(np.max(np.minimum(t1, t2), axis=-1), 0.0)
exit_ = np.maximum(np.min(np.maximum(t1, t2), axis=-1), 0.0)


def probe(th, tw):
    idx = np.arange(H * W).reshape(H // th, th, W // tw, tw)
    order = idx.transpose(0, 2, 1, 3).reshape(-1)
    R = th * tw
    nt = (H * W) // R
    sh = (nt, R)
    rs_, rb_ = rs[order].reshape(sh), rb[order].reshape(sh)
    cs_, cb_ = cs[order].reshape(sh), cb[order].reshape(sh)
    ts_, tb_ = ts[order].reshape(sh), tb[order].reshape(sh)
    so_ = sign_ok[order].reshape(sh)
    en_, ex_ = entry[order].reshape(sh), exit_[order].reshape(sh)

    worst_row = 0.0
    fit_num = 0
    fit_den = 0
    import warnings

    for b0 in range(0, N, SB):
        # batch-union footprints over the SB steps (mirrors build_step_meta)
        lo_r = np.full(nt, np.inf)
        hi_r = np.full(nt, -np.inf)
        lo_c = np.full(nt, np.inf)
        hi_c = np.full(nt, -np.inf)
        any_act = np.zeros(nt, bool)
        for j in range(b0, b0 + SB):
            t_j = ts_ * j + tb_
            act = so_ & (t_j >= en_) & (t_j < ex_)
            rows = np.clip(rs_ * j + rb_, 0.0, N - 1.0)
            colsv = np.clip(cs_ * j + cb_, 0.0, N - 1.0)
            rows = np.where(act, rows, np.nan)
            colsv = np.where(act, colsv, np.nan)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                spread = np.nanmax(rows, axis=1) - np.nanmin(rows, axis=1)
                worst_row = max(
                    worst_row, float(np.nanmax(np.where(np.isnan(spread), 0.0, spread)))
                )
                lo_c = np.fmin(lo_c, np.nanmin(colsv, axis=1))
                hi_c = np.fmax(hi_c, np.nanmax(colsv, axis=1))
            any_act |= act.any(axis=1)
        # col window: 128 wide, 128-aligned start
        c0 = np.floor(np.maximum(lo_c - 0.5, 0.0) / 128.0) * 128.0
        fits = any_act & (hi_c < c0 + 128.0) & (lo_c >= c0 - 0.5)
        fit_num += int(np.sum(fits))
        fit_den += int(np.sum(any_act))
    win = max(16, int(np.ceil((worst_row + WIN_SLACK) / 8.0)) * 8)
    print(
        f"tile {th:4d}x{tw:<4d}: win_rows={win:4d}  colwin-fit={fit_num/max(fit_den,1):6.1%}"
        f"  density-flop-ratio={win/256:5.2f}"
    )


for th, tw in [(32, 32), (16, 64), (8, 128), (4, 256), (64, 16), (128, 8), (2, 512), (1, 1024), (256, 4)]:
    probe(th, tw)
