"""Hardware probe: fast_math backward — error structure + fit convergence A/B.

Diagnoses the d_volume discrepancy of the fast_math backward (aux matmuls at
DEFAULT single-pass bf16) against the exact (x3) backward:
  1. error decomposition: cosine similarity, rel error on significant voxels,
     norm ratio — is the 12.7%-of-max error cancellation noise or bias?
  2. fit A/B: 60 adam steps on the bench scene, loss trajectories compared.

Run on TPU: timeout 900 python scripts/probe_fm_bwd.py
"""
from __future__ import annotations

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel as prod_mod


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", flush=True)

    H = W = 256
    params = RenderParams(
        density_threshold=0.15,
        raymarching_step_size=0.005,
        use_gaussian_smoothing=False,
        interpolation="trilinear",
        adaptive_stepping=False,
        use_shading=False,
        camera_grads=False,
    )
    params_fm = dataclasses.replace(params, fast_math=True)
    scene = Scene.synthetic("bonsai", side=256)
    cam = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0)
    m = cam.matrices()

    def make_loss(p):
        def loss(vol, lut):
            img = prod_mod.render_diff(Scene(vol, scene.importance, lut), m, p, H, W)
            return jnp.sum(img)
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    g_exact = make_loss(params)(scene.volume, scene.tf_lut)[1]
    g_fm = make_loss(params_fm)(scene.volume, scene.tf_lut)[1]
    dv_e = np.asarray(g_exact[0], np.float64).ravel()
    dv_f = np.asarray(g_fm[0], np.float64).ravel()
    err = dv_f - dv_e
    mx = np.abs(dv_e).max()
    cos = float(np.dot(dv_e, dv_f) / (np.linalg.norm(dv_e) * np.linalg.norm(dv_f)))
    print(f"d_volume: max|exact|={mx:.3e}  max|err|={np.abs(err).max():.3e} "
          f"({np.abs(err).max()/mx:.2%} of max)")
    print(f"  l2 rel err={np.linalg.norm(err)/np.linalg.norm(dv_e):.3e}  cos={cos:.6f}")
    # error on SIGNIFICANT voxels (|exact| > 1% of max): per-voxel rel err
    sig = np.abs(dv_e) > 0.01 * mx
    if sig.any():
        rel = np.abs(err[sig]) / np.abs(dv_e[sig])
        print(f"  significant voxels ({sig.sum()}): median rel={np.median(rel):.3e} "
              f"p99 rel={np.percentile(rel, 99):.3e} max rel={rel.max():.3e}")
    # where does max|err| land relative to the exact gradient there?
    i = int(np.abs(err).argmax())
    print(f"  worst voxel: exact={dv_e[i]:.3e} fm={dv_f[i]:.3e}")

    # ---- fit A/B --------------------------------------------------------
    target = prod_mod.render(scene, m, params, H, W)
    v0 = jnp.clip(scene.volume + 0.15 * jax.random.normal(
        jax.random.PRNGKey(0), scene.volume.shape), 0.0, 1.0)

    def run_fit(p, steps=60, lr=3e-3):
        opt = optax.adam(lr)

        @jax.jit
        def step(vol, lut, st):
            def loss_of(vl):
                img = prod_mod.render_diff(Scene(vl[0], scene.importance, vl[1]), m, p, H, W)
                return jnp.mean((img - target) ** 2)
            loss, g = jax.value_and_grad(loss_of)((vol, lut))
            upd, st = opt.update(g, st)
            vol, lut = optax.apply_updates((vol, lut), upd)
            return jnp.clip(vol, 0, 1), jnp.clip(lut, 0, 1), st, loss

        vol, lut = v0, scene.tf_lut
        st = opt.init((vol, lut))
        losses = []
        for i in range(steps):
            vol, lut, st, L = step(vol, lut, st)
            if i % 10 == 0 or i == steps - 1:
                losses.append((i, float(L)))
        return losses

    for name, p in [("exact", params), ("fast_math", params_fm)]:
        losses = run_fit(p)
        tr = "  ".join(f"{i}:{L:.3e}" for i, L in losses)
        print(f"fit[{name}]: {tr}", flush=True)


if __name__ == "__main__":
    main()
