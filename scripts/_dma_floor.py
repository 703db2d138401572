"""Measure the non-compute floor of the forward kernel: threshold above the
volume max -> occupancy grid all-empty -> every step's matmuls are skipped,
leaving DMA + scaffold (window/occupancy tests) only."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel

height = width = 256
scene = Scene.synthetic("bonsai", side=256)
m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()


def fence(out):
    return float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])


def marginal(fn, iters=25):
    def batch(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        fence(out)
        return time.perf_counter() - t0

    fence(fn())
    fence(fn())
    n1 = max(1, iters // 5)
    t1 = batch(n1)
    t2 = batch(iters)
    return (t2 - t1) / (iters - n1)


def mk(thresh):
    params = RenderParams(
        density_threshold=thresh,
        raymarching_step_size=0.005,
        use_gaussian_smoothing=False,
        interpolation="trilinear",
        adaptive_stepping=False,
        use_shading=False,
    )
    f = jax.jit(lambda v, l: slab_kernel.render(Scene(v, scene.importance, l), m, params, height, width))
    return lambda: f(scene.volume, scene.tf_lut)

print(f"volume max = {float(scene.volume.max()):.3f}")
print(f"fwd t=0.15 (27% occ) : {marginal(mk(0.15))*1e3:.2f} ms")
print(f"fwd t=0.90 (near 0%) : {marginal(mk(0.90))*1e3:.2f} ms")
print(f"fwd t=0.05 (denser)  : {marginal(mk(0.05))*1e3:.2f} ms")
