"""Measure (chunk, slab-block) pair live fractions at the bench config.

Quantifies the compacted-grid lever's ceiling before building it:
- geo:   camera-only activity (any ray active in the block's march steps)
         — statically boundable on the host, so a compacted grid can skip
         the rest soundly.
- occ:   geo AND occupancy-grid hit (the kernel's block_occ gate) — what
         actually runs step bodies today.

Savings bound: dead iterations removed x per-iteration floor
(fwd 1.43 ms / bwd 2.98 ms across 2048 iterations, BASELINE.md round-5
roofline).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel as sk
from volym_tpu.render import slab as slab_mod


def main():
    scene = Scene.synthetic("bonsai", side=256)
    cam = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0)
    m = cam.matrices()
    height = width = 256
    params = RenderParams(density_threshold=0.15, interpolation="trilinear")

    major, sign = slab_mod.dominant_axis(m)
    layout = slab_mod._AXIS_LAYOUT[major]
    vol_perm = slab_mod.permute_volume(scene.volume, major)
    n_slabs, nr, nc = vol_perm.shape
    feats, miss, r = sk._chunked_feats(m, height, width, n_slabs, major, sign, layout)
    feats = np.asarray(feats)
    C = feats.shape[0]
    sb = sk.SLAB_BATCH
    nb = n_slabs // sb

    def row(i):
        return feats[:, i, :][:, None, :]

    jf = np.arange(n_slabs, dtype=np.float32)[None, :, None]
    t = row(sk.F_TS) * jf + row(sk.F_TB)
    signok = row(sk.F_SIGNOK) > 0.5
    active = signok & (t >= row(sk.F_ENTRY)) & (t < row(sk.F_EXIT))  # (C,S,R)
    any_active = active.any(axis=2)  # (C, S)
    geo = any_active.reshape(C, nb, sb).any(axis=2)  # (C, NB)

    occ = sk.occupancy_grid(vol_perm, 0.15)
    meta = sk.build_step_meta(
        feats, occ, n_slabs=n_slabs, sb=sb, sign=sign, nr=nr, nc=nc,
        margin=1.0, win_rows=0, win_cols=0,
    )
    block_occ = np.asarray(meta[:, :, 0, 0]) > 0  # (C, NB)

    total = C * nb
    print(f"pairs total          : {total} ({C} chunks x {nb} blocks)")
    print(f"geometric live       : {geo.sum()} ({100*geo.mean():.1f}%)")
    print(f"occupancy live (occ) : {block_occ.sum()} ({100*block_occ.mean():.1f}%)")
    assert not (block_occ & ~geo).any(), "occ-live pair outside geometric set!"
    # savings estimate
    f_dead = 1.0 - geo.mean()
    print(f"fwd scaffold saving ~ {1.43*f_dead:.2f} ms; bwd ~ {2.98*f_dead:.2f} ms")
    # chunks with no live pair at all
    print(f"chunks never visited : {(~geo.any(axis=1)).sum()} / {C}")
    # slab blocks with no live chunk (slice DMA skippable)
    print(f"slab blocks dead     : {(~geo.any(axis=0)).sum()} / {nb}")


if __name__ == "__main__":
    main()
