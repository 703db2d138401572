"""Hardware validation of the Pallas slab kernels (forward + backward).

Run on a real TPU (Pallas interpret mode is too slow for the CPU suite):

    python scripts/validate_slab_tpu.py

Checks, against the gather-based jnp slab golden (render/slab.py):
  * forward allclose over all three major axes / both signs and both
    interpolation filters;
  * voxel/LUT gradients of the two-pass Pallas backward vs the jnp replay
    VJP.
Exit code 0 on success.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel
from volym_tpu.render import slab


def main() -> int:
    if jax.devices()[0].platform != "tpu":
        print("WARNING: not on TPU; this will be slow/interpreted")
    scene = Scene.synthetic("sphere", side=32)
    params = RenderParams(
        use_gaussian_smoothing=False,
        use_shading=False,
        interpolation="trilinear",
        raymarching_step_size=0.02,
    )
    failures = []

    for h, v in [(0.0, 0.0), (30.0, 20.0), (80.0, -40.0), (200.0, 10.0), (45.0, 45.0)]:
        m = Camera(aspect=1.0, distance=1.2).orbit(h, v, 0.0).matrices()
        for p in (params, params.replace(interpolation="nearest")):
            g = np.asarray(slab.render(scene, m, p, 32, 32))
            k = np.asarray(slab_kernel.render(scene, m, p, 32, 32))
            err = np.abs(g - k).max()
            tag = f"fwd cam({h},{v}) {p.interpolation.value} major={slab.dominant_axis(m)}"
            print(f"{tag}: maxerr {err:.2e}")
            if err > 1e-3:
                failures.append(tag)

    # gradients
    m = Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()
    w = jnp.cos(jnp.arange(32 * 32 * 4, dtype=jnp.float32).reshape(32, 32, 4) * 0.1)

    def loss(render_fn, vol, lut):
        img = render_fn(Scene(vol, scene.importance, lut), m, params, 32, 32)
        return jnp.sum(img * w)

    ga = jax.grad(lambda v, l: loss(slab.render_diff, v, l), argnums=(0, 1))(
        scene.volume, scene.tf_lut
    )
    gp = jax.grad(lambda v, l: loss(slab_kernel.render_diff, v, l), argnums=(0, 1))(
        scene.volume, scene.tf_lut
    )
    for name, a, b in zip(("d_volume", "d_lut"), ga, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - b).max() / scale
        print(f"bwd {name}: relerr {rel:.2e}")
        if rel > 1e-2 or not np.isfinite(b).all():
            failures.append(f"bwd {name}")

    if failures:
        print("FAILURES:", failures)
        return 1
    print("slab kernels validated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
