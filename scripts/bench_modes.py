"""Per-mode forward timing on the real chip (dev aid, not the driver bench).

Times the Pallas slab forward for each render mode on the bonsai-class
256^3 scene at 256x256 (the BASELINE.md mode table).  Usage:

    python scripts/bench_modes.py [mode ...]

Modes: base shading smoothing lookahead cone coloring fwd_bwd.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel

RES = 256


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, iters=25, warmup=2):
    """Marginal (steady-state) s/frame: batch-difference timing with one
    trailing fetch per batch, cancelling the fixed tunnel round-trip (see
    bench.py)."""

    def batch(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        fetch(out)
        return time.perf_counter() - t0

    for _ in range(warmup):
        fetch(fn())
    n1 = max(1, iters // 5)
    t1, t2 = batch(n1), batch(iters)
    return max((t2 - t1) / (iters - n1), 1e-9)


def main():
    params = RenderParams(
        density_threshold=0.15,
        use_gaussian_smoothing=False,
        interpolation="trilinear",
        adaptive_stepping=False,
        use_shading=False,
    )
    scene = Scene.synthetic("bonsai", side=256)
    # dense-ish importance so the look-ahead pre-pass cannot skip
    # everything: mark the dense half of the volume important
    imp = (np.asarray(scene.volume) > 0.3).astype(np.float32)
    scene = Scene(scene.volume, jnp.asarray(imp), scene.tf_lut)
    m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()

    modes = {
        "base": params,
        "shading": params.replace(use_shading=True),
        "smoothing": params.replace(use_gaussian_smoothing=True),
        "lookahead": params.replace(use_importance_rendering=True),
        "cone": params.replace(
            use_importance_rendering=True, use_cone_importance_check=True
        ),
        "coloring": params.replace(use_importance_coloring=True),
    }
    want = sys.argv[1:] or list(modes) + ["fwd_bwd"]
    for name in want:
        if name == "fwd_bwd":
            def loss(vol, lut):
                img = slab_kernel.render_diff(
                    Scene(vol, scene.importance, lut), m, params, RES, RES
                )
                return jnp.sum(img)

            step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
            t = timeit(lambda: step(scene.volume, scene.tf_lut))
        else:
            p = modes[name]
            t = timeit(lambda: slab_kernel.render(scene, m, p, RES, RES))
        print(f"{name:10s} {t*1e3:7.1f} ms  {RES*RES/t:>11,.0f} rays/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
