"""1024² single-chip evidence (VERDICT r3 item 4): forward and fwd+bwd
frame times on the bonsai-class 256³ scene at the reference's 1024-wide
window scale, exercising the chunk-grouped kernels (1024 chunks = 4
groups of 256)."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import marginal_time
from volym_tpu.ops import slab_kernel

scene = Scene.synthetic("bonsai", side=256)
m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()
params = RenderParams(
    density_threshold=0.15, raymarching_step_size=0.005,
    use_gaussian_smoothing=False, interpolation="trilinear",
    adaptive_stepping=False, use_shading=False, camera_grads=False,
)

for H in (256, 1024):
    f = jax.jit(
        lambda v, l: slab_kernel.render(
            Scene(v, scene.importance, l), m, params, H, H
        )
    )
    ms = marginal_time(lambda: f(scene.volume, scene.tf_lut)) * 1e3
    print(f"{H}x{H} fwd: {ms:7.2f} ms  {H*H/ms*1e3/1e6:6.2f} M rays/s", flush=True)

    def loss(vol, lut, H=H):
        img = slab_kernel.render_diff(
            Scene(vol, scene.importance, lut), m, params, H, H
        )
        return jnp.sum(img)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    ms = marginal_time(lambda: step(scene.volume, scene.tf_lut)) * 1e3
    print(
        f"{H}x{H} fwd+bwd scene-grads: {ms:7.2f} ms  "
        f"{H*H/ms*1e3/1e6:6.2f} M rays/s",
        flush=True,
    )
