"""Steady-state per-mode timings on the real chip (dispatch-batched).

Companion to scripts/validate_slab_tpu.py (exactness): this measures the
marginal frame time of each production mode at 256x256 on the synthetic
bonsai-class 256^3 scene, printing one line per mode.
"""
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
BASE = dict(
    density_threshold=0.15,
    raymarching_step_size=0.005,
    use_gaussian_smoothing=False,
    interpolation="trilinear",
    adaptive_stepping=False,
    use_shading=False,
)


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


def fwd(params):
    f = jax.jit(
        lambda v, l: slab_kernel.render(
            Scene(v, scene.importance, l), m, params, height, width
        )
    )
    return lambda: f(scene.volume, scene.tf_lut)


def fwdbwd(params):
    def loss(vol, lut):
        img = slab_kernel.render_diff(
            Scene(vol, scene.importance, lut), m, params, height, width
        )
        return jnp.sum(img)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    return lambda: step(scene.volume, scene.tf_lut)


MODES = [
    ("fwd base", fwd(RenderParams(**BASE))),
    ("fwd floor t=0.9", fwd(RenderParams(**{**BASE, "density_threshold": 0.9}))),
    ("fwd coloring", fwd(RenderParams(**{**BASE, "use_importance_coloring": True}))),
    ("fwd lookahead", fwd(RenderParams(**{**BASE, "use_importance_rendering": True}))),
    ("fwd lookahead cone", fwd(RenderParams(**{
        **BASE, "use_importance_rendering": True,
        "use_cone_importance_check": True,
    }))),
    ("fwd gaussian", fwd(RenderParams(**{**BASE, "use_gaussian_smoothing": True}))),
    ("fwd shading", fwd(RenderParams(**{**BASE, "use_shading": True}))),
    ("fwd shading fast_math", fwd(RenderParams(**{
        **BASE, "use_shading": True, "fast_math": True,
    }))),
    ("fwd+bwd scene-grads", fwdbwd(RenderParams(**{**BASE, "camera_grads": False}))),
    ("fwd+bwd full-grads", fwdbwd(RenderParams(**BASE))),
    ("fwd+bwd smoothed scene-grads", fwdbwd(RenderParams(**{
        **BASE, "use_gaussian_smoothing": True, "camera_grads": False,
    }))),
]

if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, fn in MODES:
        if only and only not in name:
            continue
        ms = marginal(fn) * 1e3
        rays = height * width / (ms / 1e3)
        print(f"{name:32s}: {ms:7.2f} ms  {rays/1e6:6.2f} M rays/s", flush=True)
