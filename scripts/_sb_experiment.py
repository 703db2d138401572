"""Experiment: grid-scaffold amortisation vs SLAB_BATCH (and chunk width).

Times fwd base / fwd floor / fwd+bwd scene-grads at 256^2 for a given
SLAB_BATCH override:  python scripts/_sb_experiment.py [sb]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import marginal_time
from volym_tpu.ops import slab_bwd_kernel, slab_kernel

sb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
slab_kernel.SLAB_BATCH = sb
slab_bwd_kernel.SLAB_BATCH = sb
print(f"SLAB_BATCH={sb}")

HEIGHT = WIDTH = 256
scene = Scene.synthetic("bonsai", side=256)
m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()
BASE = dict(
    density_threshold=0.15,
    raymarching_step_size=0.005,
    use_gaussian_smoothing=False,
    interpolation="trilinear",
    adaptive_stepping=False,
    use_shading=False,
)


def P(**kw):
    return RenderParams(**{**BASE, **kw})


def fwd(params):
    f = jax.jit(
        lambda v, l: slab_kernel.render(
            Scene(v, scene.importance, l), m, params, HEIGHT, WIDTH
        )
    )
    return lambda: f(scene.volume, scene.tf_lut)


def fwdbwd(params):
    def loss(vol, lut):
        img = slab_kernel.render_diff(
            Scene(vol, scene.importance, lut), m, params, HEIGHT, WIDTH
        )
        return jnp.sum(img)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    return lambda: step(scene.volume, scene.tf_lut)


for name, fn in [
    ("fwd base", fwd(P())),
    ("fwd floor t=0.9", fwd(P(density_threshold=0.9))),
    ("fwd+bwd scene-grads", fwdbwd(P(camera_grads=False))),
]:
    ms = marginal_time(fn) * 1e3
    print(f"{name:24s}: {ms:7.2f} ms  {HEIGHT*WIDTH/ms*1e3/1e6:6.2f} M rays/s",
          flush=True)
