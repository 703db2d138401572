"""Measure the non-compute floor of the forward kernel: threshold above the
volume max -> occupancy grid all-empty -> every step's matmuls are skipped,
leaving DMA + scaffold (window/occupancy tests) only."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import marginal_time as marginal
from volym_tpu.ops import slab_kernel

height = width = 256
scene = Scene.synthetic("bonsai", side=256)
m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()


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
