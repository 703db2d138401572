"""Isolate the `bwd windowed d_volume` hardware discrepancy.

Computes the big-scene (256^3 @ 128^2, d=1.2, window_rows=56) backward
d_volume four ways and cross-compares:
  A. Pallas, windowed (the failing config)
  B. Pallas, full width (window_rows forced 0)
  C. jnp slab replay (the validate reference)
  D. Pallas windowed, subtexel_bits=0
If A==B but both differ from C -> not windowing: split-contraction vs f32
density threshold flips on this scene.  If A!=B -> windowing-specific.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel
from volym_tpu.render import slab

params = RenderParams(
    use_gaussian_smoothing=False, use_shading=False,
    interpolation="trilinear", raymarching_step_size=0.02,
)
big = Scene.synthetic("sphere", side=64)
mw = Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()
w128 = jnp.cos(
    jnp.arange(128 * 128 * 4, dtype=jnp.float32).reshape(128, 128, 4) * 0.1
)


def grad_pallas(p):
    def loss(vol, lut):
        img = slab_kernel.render_diff(
            Scene(vol, big.importance, lut), mw, p, 128, 128
        )
        return jnp.sum(img * w128)

    return jax.grad(loss, argnums=(0, 1))(big.volume, big.tf_lut)


def grad_jnp(p):
    def loss(vol, lut):
        img = slab.render_diff(Scene(vol, big.importance, lut), mw, p, 128, 128)
        return jnp.sum(img * w128)

    return jax.grad(loss, argnums=(0, 1))(big.volume, big.tf_lut)


def rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(a).max(), 1e-9)
    i = np.unravel_index(np.abs(a - b).argmax(), a.shape)
    return np.abs(a - b).max() / scale, i, a[i], b[i]


A = grad_pallas(params)
orig_wr = slab_kernel.window_rows
slab_kernel.window_rows = lambda *a, **k: 0
try:
    B = grad_pallas(params)
finally:
    slab_kernel.window_rows = orig_wr
C = grad_jnp(params)
D = grad_pallas(params.replace(subtexel_bits=0))
C0 = grad_jnp(params.replace(subtexel_bits=0))

for name, x, y in (
    ("A(win) vs B(full)", A, B),
    ("A(win) vs C(jnp)", A, C),
    ("B(full) vs C(jnp)", B, C),
    ("D(win,stx0) vs C0(jnp,stx0)", D, C0),
):
    r, i, av, bv = rel(x[0], y[0])
    print(f"d_volume {name}: rel {r:.3e} at {i} ({av:.6g} vs {bv:.6g})")
