"""Profile the bench.py production step: per-kernel on-device times."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import force_sync, marginal_time
from volym_tpu.ops import slab_kernel

height = width = 256
params = RenderParams(
    density_threshold=0.15,
    raymarching_step_size=0.005,
    use_gaussian_smoothing=False,
    interpolation="trilinear",
    adaptive_stepping=False,
    use_shading=False,
    camera_grads=False,
)
scene = Scene.synthetic("bonsai", side=256)
m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()


def loss(vol, lut):
    img = slab_kernel.render_diff(Scene(vol, scene.importance, lut), m, params, height, width)
    return jnp.sum(img)


step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
fwd = jax.jit(lambda v, l: jnp.sum(slab_kernel.render_diff(Scene(v, scene.importance, l), m, params, height, width)))

print(f"fwd only      : {marginal_time(lambda: fwd(scene.volume, scene.tf_lut))*1e3:.2f} ms")
print(f"fwd+bwd       : {marginal_time(lambda: step(scene.volume, scene.tf_lut))*1e3:.2f} ms")

with jax.profiler.trace("/tmp/prof_fwdbwd"):
    for _ in range(3):
        out = step(scene.volume, scene.tf_lut)
    force_sync(out)
print("trace written to /tmp/prof_fwdbwd")
