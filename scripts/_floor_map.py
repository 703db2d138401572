"""Map the forward floor vs (SLAB_BATCH, TILE): fwd base + empty-frame
floor at 256² for one knob combination per process.

    python scripts/_floor_map.py [sb] [tile]
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

sb = sys.argv[1] if len(sys.argv) > 1 else "8"
tile = sys.argv[2] if len(sys.argv) > 2 else "32"
os.environ["VOLYM_SLAB_BATCH"] = sb
os.environ["VOLYM_TILE"] = tile

import jax

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import marginal_time
from volym_tpu.ops import slab_kernel

print(f"SLAB_BATCH={slab_kernel.SLAB_BATCH} TILE={slab_kernel.TILE}", flush=True)
height = width = 256
scene = Scene.synthetic("bonsai", side=256)
m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()
base = RenderParams(
    density_threshold=0.15, raymarching_step_size=0.005,
    use_gaussian_smoothing=False, interpolation="trilinear",
    adaptive_stepping=False, use_shading=False,
)


def fwd(params):
    f = jax.jit(
        lambda v, l: slab_kernel.render(
            Scene(v, scene.importance, l), m, params, height, width
        )
    )
    return lambda: f(scene.volume, scene.tf_lut)


for name, p in [("fwd base", base), ("fwd floor t=0.9", base.replace(density_threshold=0.9))]:
    ms = marginal_time(fwd(p)) * 1e3
    print(f"{name:18s}: {ms:6.2f} ms", flush=True)
