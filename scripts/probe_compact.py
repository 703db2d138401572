"""On-chip A/B for the compacted live-pair grid (slab_kernel.build_pairs).

Compares VOLYM_COMPACT on/off IN ONE PROCESS by monkeypatching the module
flag (it is read at trace time): bit-exactness of image + gradients, then
marginal frame times for forward and fwd+bwd at the bench config.
"""

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import marginal_time
from volym_tpu.ops import slab_kernel as sk
from volym_tpu.render import slab


def main():
    scene = Scene.synthetic("bonsai", side=256)
    cam = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0)
    m = cam.matrices()
    H = W = 256
    params = RenderParams(
        density_threshold=0.15,
        raymarching_step_size=0.005,
        use_gaussian_smoothing=False,
        use_shading=False,
        interpolation="trilinear",
        adaptive_stepping=False,
        camera_grads=False,
        u8_volume=True,
    )

    target = jnp.zeros((H, W, 4), jnp.float32)

    def loss_fn(sc):
        img = sk.render_diff(sc, m, params, H, W)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.value_and_grad(
        lambda vol, lut: loss_fn(
            dataclasses.replace(scene, volume=vol, tf_lut=lut)
        ),
        argnums=(0, 1),
    )

    def run(compact):
        sk.COMPACT = compact
        sk._pair_cache.clear()
        img = np.asarray(sk.render(scene, m, params, H, W))
        (l, (dv, dl)) = grad_fn(scene.volume, scene.tf_lut)
        return img, float(l), np.asarray(dv), np.asarray(dl)

    saved = sk.COMPACT
    try:
        i0, l0, dv0, dl0 = run(False)
        i1, l1, dv1, dl1 = run(True)
        print(f"pair buckets: {sk.pair_buckets(m, H, W, 256, *slab.dominant_axis(m))}")
        print(f"image maxdiff : {np.abs(i0 - i1).max():.2e}")
        print(f"loss          : {l0:.6e} vs {l1:.6e}")
        print(f"d_vol maxdiff : {np.abs(dv0 - dv1).max():.2e}")
        print(f"d_lut maxdiff : {np.abs(dl0 - dl1).max():.2e}")

        # timings (same-session A/B)
        for compact in (False, True):
            sk.COMPACT = compact
            sk._pair_cache.clear()
            fwd = lambda: sk.render(scene, m, params, H, W)
            t_f = marginal_time(fwd, iters=30)
            bwd = lambda: grad_fn(scene.volume, scene.tf_lut)[1][0]
            t_b = marginal_time(bwd, iters=30)
            tag = "compact" if compact else "full   "
            print(
                f"{tag}: fwd {t_f*1e3:6.2f} ms | fwd+bwd {t_b*1e3:6.2f} ms "
                f"({H*W/t_b/1e6:.2f} M rays/s)"
            )
        # empty-frame floor (threshold 0.9)
        p9 = params.replace(density_threshold=0.9)
        for compact in (False, True):
            sk.COMPACT = compact
            sk._pair_cache.clear()
            t_f = marginal_time(lambda: sk.render(scene, m, p9, H, W), iters=30)
            tag = "compact" if compact else "full   "
            print(f"{tag}: empty-frame fwd floor {t_f*1e3:6.2f} ms")
    finally:
        sk.COMPACT = saved


if __name__ == "__main__":
    main()
