"""512³ production-path probe on the real chip (BASELINE.md evidence).

Renders every production mode at 512³ (the scoped-VMEM budgeting work:
vmem_params slice/stream accounting + the fused-backward working-set
gate) and times the base forward and fwd+bwd.  Importance modes get a
sparse important cube so their gates have signal.

    python scripts/probe_512.py [mode substring ...]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import marginal_time
from volym_tpu.ops import slab_kernel
from volym_tpu.render import slab

N = 512
RES = 256


def main() -> int:
    want = sys.argv[1:]
    scene = Scene.synthetic("bonsai", side=N)
    vol = np.asarray(scene.volume)
    imp = np.zeros_like(vol)
    imp[200:280, 200:280, 200:280] = 1.0
    scene = Scene(jnp.asarray(vol), jnp.asarray(imp), scene.tf_lut)
    m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()
    base = dict(
        density_threshold=0.15, raymarching_step_size=1.0 / N,
        interpolation="trilinear", adaptive_stepping=False,
        use_gaussian_smoothing=False, use_shading=False, camera_grads=False,
    )
    modes = {
        "base": {},
        "shaded": dict(use_shading=True),
        "coloring": dict(use_importance_coloring=True),
        "smoothing": dict(use_gaussian_smoothing=True),
        "lookahead": dict(use_importance_rendering=True),
        "cone": dict(
            use_importance_rendering=True, use_cone_importance_check=True
        ),
    }
    for name, kw in modes.items():
        if want and not any(w in name for w in want):
            continue
        p = RenderParams(**{**base, **kw})
        f = jax.jit(lambda s, p=p: slab_kernel.render(s, m, p, RES, RES))
        img = f(scene)
        jax.block_until_ready(img)
        print(f"512^3 fwd {name:10s}: ok  max={float(jnp.max(img)):.3f}", flush=True)
    if not want or any("base" in w for w in want):
        # 1/N step -> native 512 planes: the u8 integer-exact stream is
        # eligible (no slab resample); the step mapping at the default
        # 0.005 step resolves to a 256-plane ladder where u8 gates off
        for tag, p in (
            ("f32", RenderParams(**base)),
            ("u8 ", RenderParams(**{**base, "u8_volume": True})),
        ):
            f = jax.jit(lambda s, p=p: slab_kernel.render(s, m, p, RES, RES))
            jax.block_until_ready(f(scene))
            t = marginal_time(lambda: f(scene), iters=10)
            print(
                f"512^3 fwd base {tag} @{RES}^2: {t*1e3:.1f} ms  "
                f"{RES*RES/t/1e6:.2f} M rays/s"
            )

            def loss(vol, lut, p=p):
                img = slab_kernel.render_diff(
                    Scene(vol, scene.importance, lut), m, p, RES, RES
                )
                return jnp.sum(img)

            step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
            jax.block_until_ready(step(scene.volume, scene.tf_lut))
            t2 = marginal_time(lambda: step(scene.volume, scene.tf_lut), iters=10)
            print(
                f"512^3 fwd+bwd scene-grads {tag} @{RES}^2: {t2*1e3:.1f} ms  "
                f"{RES*RES/t2/1e6:.2f} M rays/s"
            )
    # the two working-set-gated backward paths (code-review findings)
    if not want or any("gated" in w for w in want):
        p_sh = RenderParams(**{**base, "use_shading": True})
        g = jax.jit(
            jax.grad(
                lambda v: jnp.sum(
                    slab_kernel.render_diff(
                        Scene(v, scene.importance, scene.tf_lut), m, p_sh,
                        RES, RES,
                    )
                )
            )
        )(scene.volume)
        print("512^3 shaded bwd (unfused fallback): ok", flush=True)
        p_cam = RenderParams(
            **{**base, "use_gaussian_smoothing": True, "camera_grads": True}
        )
        major, sign = slab.dominant_axis(m)
        planes = slab.resolve_planes(p_cam, N)
        win = slab_kernel.window_rows(
            m, 128, 128, planes, major, sign, halo=slab.SMOOTH_HALO, n_plane=N
        )

        def loss_cam(mm):
            img = slab_kernel._render_pallas_diff_jit(
                scene, mm, p_cam.pallas_static(), 128, 128, major, sign, win,
                knobs=p_cam.knobs(), planes=planes,
            )
            return jnp.sum(img)

        gm = jax.grad(loss_cam)(m)
        jax.block_until_ready(gm)
        print("512^3 smoothed camera grads (pass 2b): ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
