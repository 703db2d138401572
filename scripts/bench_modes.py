"""Steady-state per-mode timings on the real chip (dispatch-batched).

Companion to scripts/validate_slab_tpu.py (exactness): this measures the
marginal frame time of each production mode at 256x256 on the synthetic
bonsai-class 256^3 scene — the BASELINE.md mode table — printing one line
per mode.  Usage:

    python scripts/bench_modes.py [substring ...]   # filter by mode name
    python scripts/bench_modes.py --dense-importance ...

``--dense-importance`` marks the dense half of the volume important so
the look-ahead pre-pass cannot skip everything (worst-case pre-pass
cost); the default uses the synthetic scene's own importance blob.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import device_frame_ms, marginal_time
from volym_tpu.ops import slab_kernel

HEIGHT = WIDTH = 256
BASE = dict(
    density_threshold=0.15,
    raymarching_step_size=0.005,
    use_gaussian_smoothing=False,
    interpolation="trilinear",
    adaptive_stepping=False,
    use_shading=False,
    # production default (bench.py, CLI): integer-exact bf16 streaming for
    # the u8-origin volume; _u8_active gates the unsupported combinations
    # (smoothing, camera grads) back to f32 automatically
    u8_volume=True,
)


def fwd(scene, m, params, height=HEIGHT, width=WIDTH):
    f = jax.jit(
        lambda v, l: slab_kernel.render(
            Scene(v, scene.importance, l), m, params, height, width
        )
    )
    return lambda: f(scene.volume, scene.tf_lut)


def fwdbwd(scene, m, params, height=HEIGHT, width=WIDTH):
    def loss(vol, lut):
        img = slab_kernel.render_diff(
            Scene(vol, scene.importance, lut), m, params, height, width
        )
        return jnp.sum(img)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    return lambda: step(scene.volume, scene.tf_lut)


def main() -> int:
    args = sys.argv[1:]
    dense_imp = "--dense-importance" in args
    want = [a for a in args if not a.startswith("--")]

    scene = Scene.synthetic("bonsai", side=256)
    if dense_imp:
        imp = (np.asarray(scene.volume) > 0.3).astype(np.float32)
        scene = Scene(scene.volume, jnp.asarray(imp), scene.tf_lut)
    m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()

    def P(**kw):
        return RenderParams(**{**BASE, **kw})

    modes = [
        ("fwd base", fwd(scene, m, P())),
        ("fwd floor t=0.9", fwd(scene, m, P(density_threshold=0.9))),
        ("fwd coloring", fwd(scene, m, P(use_importance_coloring=True))),
        ("fwd lookahead", fwd(scene, m, P(use_importance_rendering=True))),
        ("fwd lookahead cone", fwd(scene, m, P(
            use_importance_rendering=True, use_cone_importance_check=True,
        ))),
        ("fwd gaussian", fwd(scene, m, P(use_gaussian_smoothing=True))),
        ("fwd shading", fwd(scene, m, P(use_shading=True))),
        ("fwd shading fast_math", fwd(scene, m, P(
            use_shading=True, fast_math=True,
        ))),
        ("fwd+bwd scene-grads", fwdbwd(scene, m, P(camera_grads=False))),
        ("fwd+bwd full-grads", fwdbwd(scene, m, P())),
        ("fwd+bwd smoothed scene-grads", fwdbwd(scene, m, P(
            use_gaussian_smoothing=True, camera_grads=False,
        ))),
        ("fwd+bwd fast_math scene-grads", fwdbwd(scene, m, P(
            camera_grads=False, fast_math=True,
        ))),
        ("fwd+bwd coloring", fwdbwd(scene, m, P(
            use_importance_coloring=True, camera_grads=False,
        ))),
        ("fwd+bwd lookahead", fwdbwd(scene, m, P(
            use_importance_rendering=True, camera_grads=False,
        ))),
        ("fwd+bwd lookahead cone", fwdbwd(scene, m, P(
            use_importance_rendering=True, use_cone_importance_check=True,
            camera_grads=False,
        ))),
        # the reference kernel shades unconditionally (wgsl:306-311) and
        # defaults smoothing ON (src/state.rs:46): its default config's
        # differentiable rows (VERDICT r4 item 5)
        ("fwd+bwd shaded scene-grads", fwdbwd(scene, m, P(
            use_shading=True, camera_grads=False,
        ))),
        ("fwd+bwd shaded fast_math", fwdbwd(scene, m, P(
            use_shading=True, camera_grads=False, fast_math=True,
        ))),
        ("fwd+bwd shaded+smoothed", fwdbwd(scene, m, P(
            use_shading=True, use_gaussian_smoothing=True, camera_grads=False,
        ))),
        ("fwd+bwd ref-default (sh+sm t.12 s.01)", fwdbwd(scene, m, P(
            use_shading=True, use_gaussian_smoothing=True, camera_grads=False,
            density_threshold=0.12, raymarching_step_size=0.010,
        ))),
    ]
    # the reference's own benchmark window (src/main.rs:357)
    m_ref = Camera(aspect=1024 / 768, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()
    wide = [
        ("fwd base @1024x768", fwd(scene, m_ref, P(), 768, 1024), 768 * 1024),
        ("fwd+bwd scene-grads @1024x768",
         fwdbwd(scene, m_ref, P(camera_grads=False), 768, 1024), 768 * 1024),
    ]
    for name, fn in modes:
        if want and not any(w in name for w in want):
            continue
        ms = marginal_time(fn) * 1e3
        rays = HEIGHT * WIDTH / (ms / 1e3)
        print(f"{name:32s}: {ms:7.2f} ms  {rays/1e6:6.2f} M rays/s", flush=True)
    for name, fn, n_rays in wide:
        if want and not any(w in name for w in want):
            continue
        # device time for the wide rows: their ~12 MB result fetch is
        # bandwidth-bound through the tunnel and its jitter swamps the
        # wall-clock differencing (see bench.harness.device_frame_ms)
        ms = device_frame_ms(fn, frames=4)
        rays = n_rays / (ms / 1e3)
        print(
            f"{name:32s}: {ms:7.2f} ms  {rays/1e6:6.2f} M rays/s"
            f"  ({1e3/ms:.0f} FPS, device time)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
