"""Trace-time sweep of the REAL Pallas entry points on CPU.

The eager kernel emulator (tests/pallas_emu.py) executes only the taken
side of each ``pl.when`` branch, while real Pallas traces BOTH sides
unconditionally — so a Python-level error inside an untaken branch (e.g.
the straight look-ahead's dead-block ``steps(False, None)`` regression)
passes the whole emulated suite and then crashes at first contact with
real tracing on hardware.  ``jax.eval_shape`` runs that real trace
(pallas_call builds the kernel jaxpr at abstract-eval time, no Mosaic
compile, no TPU) in milliseconds per mode, so every mode combination of
every kernel is trace-checked in CI on both grid layouts:

- chunk-outer  (32x32 rays -> 1 chunk  < INVERT_MIN_CHUNKS)
- slab-outer   (96x96 rays -> 9 chunks >= INVERT_MIN_CHUNKS, aliased
  accumulators) with occupancy gating active (32-divisible slices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel


def _scene(side=32):
    return Scene.synthetic("bonsai", side=side)


CAM = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()

MODES = {
    "base": {},
    "first_hit": {"use_opacity": False, "use_shading": False},
    "coloring": {"use_importance_coloring": True},
    "shading": {"use_shading": True},
    "coloring_shading": {"use_importance_coloring": True, "use_shading": True},
    "smoothing": {"use_gaussian_smoothing": True},
    "smoothing_shading": {"use_gaussian_smoothing": True, "use_shading": True},
    "lookahead": {"use_importance_rendering": True},
    "lookahead_cone": {
        "use_importance_rendering": True,
        "use_cone_importance_check": True,
    },
    "lookahead_shaded": {
        "use_importance_rendering": True,
        "use_shading": True,
    },
    "fast_math": {"fast_math": True},
    "fast_math_shaded": {"fast_math": True, "use_shading": True},
    "fast_math_smoothed": {"fast_math": True, "use_gaussian_smoothing": True},
    "nearest": {"interpolation": "nearest"},
}


def _params(**kw):
    base = dict(
        density_threshold=0.15,
        use_gaussian_smoothing=False,
        use_shading=False,
        interpolation="trilinear",
        adaptive_stepping=False,
    )
    base.update(kw)
    return RenderParams(**base)


@pytest.mark.parametrize("res", [32, 96], ids=["chunk_outer", "slab_outer"])
@pytest.mark.parametrize("mode", sorted(MODES))
def test_forward_traces(mode, res):
    scene = _scene()
    params = _params(**MODES[mode])
    out = jax.eval_shape(
        lambda: slab_kernel.render(scene, CAM, params, res, res)
    )
    assert out.shape == (res, res, 4)


@pytest.mark.parametrize("res", [32, 96], ids=["chunk_outer", "slab_outer"])
@pytest.mark.parametrize(
    "mode", sorted(m for m in MODES if m not in ("first_hit",))
)
def test_backward_traces(mode, res):
    scene = _scene()
    params = _params(**MODES[mode])

    def loss(vol, lut):
        img = slab_kernel.render_diff(
            Scene(vol, scene.importance, lut), CAM, params, res, res
        )
        return jnp.sum(img)

    g = jax.eval_shape(
        lambda: jax.grad(loss, argnums=(0, 1))(scene.volume, scene.tf_lut)
    )
    assert g[0].shape == scene.volume.shape
    assert g[1].shape == scene.tf_lut.shape


def test_backward_traces_scene_only():
    """camera_grads=False skips the d_feats chains — separate kernel paths."""
    scene = _scene()
    params = _params(camera_grads=False)

    def loss(vol, lut):
        img = slab_kernel.render_diff(
            Scene(vol, scene.importance, lut), CAM, params, 96, 96
        )
        return jnp.sum(img)

    g = jax.eval_shape(
        lambda: jax.grad(loss, argnums=(0, 1))(scene.volume, scene.tf_lut)
    )
    assert g[0].shape == scene.volume.shape


def test_backward_traces_camera():
    """Cotangents through the packed feats -> ray origin/directions (the
    camera-pose chain; ``dominant_axis``/``window_rows`` are host-side
    static choices, so the public render_diff takes camera grads through
    the ray bundle — same pattern as test_slab.test_slab_camera_grads)."""
    from volym_tpu.render import rays as rays_mod
    from volym_tpu.render import slab as slab_mod

    scene = _scene()
    params = _params()
    major, sign = slab_mod.dominant_axis(CAM)
    layout = slab_mod._AXIS_LAYOUT[major]
    vol_perm = slab_mod.permute_volume(scene.volume, major)
    origin, dirs = rays_mod.generate_rays(CAM, 96, 96)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(o, d):
        feats = slab_kernel.features_from_rays(
            o, d, entry, exit_, vol_perm.shape[0], major, sign, layout
        )
        fc = slab_kernel._chunk_flat(feats)
        out = slab_kernel.march_pallas(
            params, major, sign, 0, (), vol_perm, scene.tf_lut, fc, params.knobs()
        )
        return jnp.sum(out)

    g = jax.eval_shape(lambda: jax.grad(loss, argnums=(0, 1))(origin, dirs))
    assert g[1].shape == dirs.shape
