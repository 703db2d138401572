"""Quick TPU check of the cone look-ahead Pallas path vs the jnp golden."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel
from volym_tpu.render import slab

side = 32
vol = np.full((side, side, side), 0.45, np.float32)
imp = np.zeros((side, side, side), np.float32)
vol[20:26, 8:24, 8:24] = 0.9
imp[20:26, 8:24, 8:24] = 1.0
base_scene = Scene.synthetic("sphere", side=side)
la_scene = Scene(
    volume=jnp.asarray(vol), importance=jnp.asarray(imp),
    tf_lut=base_scene.tf_lut,
)
m_la = Camera(aspect=1.0, distance=1.3).orbit(10.0, 5.0, 0.0).matrices()
params = RenderParams(
    use_gaussian_smoothing=False,
    use_importance_rendering=True,
    use_cone_importance_check=True,
)
base = np.asarray(
    slab.render(la_scene, m_la, params.replace(use_importance_rendering=False),
                32, 32))
t0 = time.perf_counter()
want = np.asarray(slab.render(la_scene, m_la, params, 32, 32))
print(f"golden cone: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
got = np.asarray(slab_kernel.render(la_scene, m_la, params, 32, 32))
print(f"pallas cone compile+run: {time.perf_counter()-t0:.1f}s")
engaged = np.abs(want - base).max()
frac = (np.abs(got - want).max(-1) > 1e-3).mean()
print(f"engaged={engaged:.3f} mismatch frac={frac:.2e}")
assert engaged >= 0.05, "look-ahead not engaged"
assert frac <= 0.01, f"cone mismatch {frac}"
print("OK")
