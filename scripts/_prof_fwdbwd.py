"""Profile the bench.py production step: per-kernel on-device times."""
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

def fence(out):
    return float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])

fence(step(scene.volume, scene.tf_lut))
fence(fwd(scene.volume, scene.tf_lut))

def marginal(fn, iters=20):
    t0 = time.perf_counter(); out=None
    for _ in range(4): out = fn(scene.volume, scene.tf_lut)
    fence(out); t1 = time.perf_counter()
    for _ in range(iters): out = fn(scene.volume, scene.tf_lut)
    fence(out); t2 = time.perf_counter()
    return (t2 - t1 - (t1 - t0) * 0) / iters  # simple: big batch minus nothing

# marginal via two batch sizes
def marginal2(fn, iters=25):
    def batch(n):
        t0 = time.perf_counter(); out=None
        for _ in range(n): out = fn(scene.volume, scene.tf_lut)
        fence(out)
        return time.perf_counter() - t0
    n1 = max(1, iters // 5)
    t1 = batch(n1); t2 = batch(iters)
    return (t2 - t1) / (iters - n1)

print(f"fwd only      : {marginal2(fwd)*1e3:.2f} ms")
print(f"fwd+bwd       : {marginal2(step)*1e3:.2f} ms")

with jax.profiler.trace("/tmp/prof_fwdbwd"):
    for _ in range(3):
        out = step(scene.volume, scene.tf_lut)
    fence(out)
print("trace written to /tmp/prof_fwdbwd")
