"""Minimal repro of the validate 'bwd windowed d_volume' failure:
64^3 sphere, 128^2 rays, d=1.2 camera, step 0.02 — Pallas render_diff
vs the jnp replay, d_volume max-rel error."""
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
    use_gaussian_smoothing=False,
    use_shading=False,
    interpolation="trilinear",
    raymarching_step_size=0.02,
)
big = Scene.synthetic("sphere", side=64)
mw = Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()
print("planes:", slab.resolve_planes(params, 64))
major, sign = slab.dominant_axis(mw)
print("win:", slab_kernel.window_rows(mw, 128, 128,
                                      slab.resolve_planes(params, 64),
                                      major, sign, n_plane=64))
w128 = jnp.cos(jnp.arange(128 * 128 * 4, dtype=jnp.float32).reshape(128, 128, 4) * 0.1)


def loss(render_fn, vol, lut):
    img = render_fn(Scene(vol, big.importance, lut), mw, params, 128, 128)
    return jnp.sum(img * w128)


gw = jax.grad(lambda v, l: loss(slab_kernel.render_diff, v, l), argnums=(0, 1))(
    big.volume, big.tf_lut
)
gj = jax.grad(lambda v, l: loss(slab.render_diff, v, l), argnums=(0, 1))(
    big.volume, big.tf_lut
)
for name, a, b in zip(("d_volume", "d_lut"), gj, gw):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(a).max(), 1e-9)
    rel = np.abs(a - b).max() / scale
    idx = np.unravel_index(np.argmax(np.abs(a - b)), a.shape)
    print(f"{name}: relerr {rel:.3e} at {idx}; jnp {a[idx]:.5e} pal {b[idx]:.5e}")
