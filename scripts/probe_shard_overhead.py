"""Sharded-vs-direct overhead on the real chip (VERDICT r4 item 2).

The sharded production path (`parallel/mesh._pallas_shard_march`) now
re-applies the single-device layout levers per shard — the 32x32
tile-order permutation and the static `win_rows` window.  This probe
runs BOTH paths on the same chip, same session, at the bench config
(bonsai-class 256^3, 256^2 rays, threshold 0.15, trilinear):

  1. forward:  ops/slab_kernel.render  vs  render_sharded(mesh=[chip])
  2. fwd+bwd:  value_and_grad of the same MSE loss through
     slab_kernel.render_diff  vs  make_train_step(mesh=[chip])
  3. correctness: sharded == direct images / gradients (the layouts are
     identical now, so errors are float-class only)

Run: python scripts/probe_shard_overhead.py   (needs the TPU)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import device_frame_ms, marginal_time
from volym_tpu.ops import slab_kernel as sk
from volym_tpu.parallel import mesh as pmesh

assert jax.devices()[0].platform == "tpu", "this probe measures the chip"

SIDE = 256
RES = 256
params = RenderParams(
    density_threshold=0.15,
    raymarching_step_size=0.005,
    use_gaussian_smoothing=False,
    interpolation="trilinear",
    adaptive_stepping=False,
    use_shading=False,
    camera_grads=False,
)
scene = Scene.synthetic("bonsai", side=SIDE)
m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()
mesh1 = pmesh.make_mesh(jax.devices()[:1])

# --- forward ---------------------------------------------------------------
img_d = sk.render(scene, m, params, RES, RES)
img_s = pmesh.render_sharded(scene, m, params, RES, RES, mesh1, backend="slab_pallas")
err = float(jnp.abs(img_d - img_s).max())
print(f"forward image maxerr sharded vs direct: {err:.2e}", flush=True)

t_d = marginal_time(lambda: sk.render(scene, m, params, RES, RES), iters=30)
t_s = marginal_time(
    lambda: pmesh.render_sharded(scene, m, params, RES, RES, mesh1, backend="slab_pallas"),
    iters=30,
)
print(
    f"forward: direct {t_d*1e3:.2f} ms | sharded(1-dev mesh) {t_s*1e3:.2f} ms"
    f" | overhead {(t_s/t_d-1)*100:+.1f}%",
    flush=True,
)

# --- fwd+bwd ---------------------------------------------------------------
target = img_d * 0.8


def loss_direct(s):
    img = sk.render_diff(s, m, params, RES, RES)
    return jnp.mean((img - target) ** 2)


direct_step = jax.jit(jax.value_and_grad(loss_direct))
step = pmesh.make_train_step(
    params, RES, RES, mesh1, backend="slab_pallas", camera_matrices=m
)

l_d, g_d = direct_step(scene)
l_s, g_s = step(scene, m, target)
rel_l = abs(float(l_d) - float(l_s)) / max(abs(float(l_d)), 1e-12)
a, b = np.asarray(g_d.volume), np.asarray(g_s.volume)
rel_v = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
a, b = np.asarray(g_d.tf_lut), np.asarray(g_s.tf_lut)
rel_t = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
print(
    f"fwd+bwd: loss rel {rel_l:.2e} | d_volume rel {rel_v:.2e} | d_lut rel {rel_t:.2e}",
    flush=True,
)

tb_d = marginal_time(lambda: direct_step(scene), iters=25)
tb_s = marginal_time(lambda: step(scene, m, target), iters=25)
print(
    f"fwd+bwd: direct {tb_d*1e3:.2f} ms | sharded(1-dev mesh) {tb_s*1e3:.2f} ms"
    f" | overhead {(tb_s/tb_d-1)*100:+.1f}%",
    flush=True,
)

# --- chunk-grouped + cone pre-pass under sharding (VERDICT r4 item 8) ------
# 1024^2 rays = 1024 chunks per shard on the 1-device mesh: > CHUNK_GROUP
# (256), so the sharded path exercises the sequential grouped calls that
# stream the volume once per group; cone mode runs the reverse look-ahead
# pre-pass per shard.
BIG = 1024
cone_p = params.replace(
    use_importance_rendering=True, use_cone_importance_check=True
)
imp = np.zeros((SIDE, SIDE, SIDE), np.float32)
imp[96:160, 96:160, 96:160] = 1.0
cone_scene = Scene(
    volume=scene.volume, importance=jnp.asarray(imp), tf_lut=scene.tf_lut
)
err_big = err_cone = 0.0
for tag, sc, p in (("grouped base", scene, params), ("grouped cone", cone_scene, cone_p)):
    a = sk.render(sc, m, p, BIG, BIG)
    b = pmesh.render_sharded(sc, m, p, BIG, BIG, mesh1, backend="slab_pallas")
    e = float(jnp.abs(a - b).max())
    # device time, not wall clock: a 1024^2 RGBA fetch is ~16 MB through
    # the tunnel (~1.6 s, bandwidth-bound) and its jitter swamps the
    # 40 ms frame in the wall-clock differencing (see device_frame_ms)
    ta = device_frame_ms(lambda: sk.render(sc, m, p, BIG, BIG))
    tb = device_frame_ms(
        lambda: pmesh.render_sharded(sc, m, p, BIG, BIG, mesh1, backend="slab_pallas"),
    )
    print(
        f"{tag} @{BIG}^2 (device time): maxerr {e:.2e} | direct {ta:.1f} ms |"
        f" sharded {tb:.1f} ms | overhead {(tb/ta-1)*100:+.1f}%",
        flush=True,
    )
    if "base" in tag:
        err_big = e
    else:
        err_cone = e

ok = (
    err < 5e-3 and rel_l < 1e-4 and rel_v < 1e-2 and rel_t < 1e-2
    and err_big < 5e-3 and err_cone < 5e-3
)
print("OK" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
