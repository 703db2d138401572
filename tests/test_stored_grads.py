"""CI coverage for the stored-gradient-samples shaded backward.

VERDICT r4 item 5's lever ("gradient-field reuse from the forward"): when
the stored-density replay applies and shading is on, the forward emits a
width-4 residual (density + gx + gy + gz per step) and the backward
replay streams NEITHER the volume nor the 3-channel gradient field — it
reuses the forward's own samples (``slab_bwd_kernel`` ``stored_grads``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.pallas_emu import emulate
from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_bwd_kernel, slab_kernel
from volym_tpu.render import slab

RES = 32

PARAMS = RenderParams(
    use_gaussian_smoothing=False,
    use_shading=True,
    interpolation="trilinear",
    adaptive_stepping=False,
    raymarching_step_size=1.0 / 16.0,
    camera_grads=False,
)


@pytest.fixture(scope="module")
def scene():
    return Scene.synthetic("sphere", side=16)


@pytest.fixture(scope="module")
def cam():
    return Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0)


def _setup(scene, m, params):
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    grad_perm = slab.permute_gradient(
        slab.gradient_volume(scene.volume), major
    )
    return vol_perm, feats, grad_perm, major, sign


@pytest.mark.parametrize("u8", [False, True])
def test_shaded_stored_grads_match_streaming(scene, cam, u8):
    """Stored-grads replay == streaming replay, bitwise: the stored g
    samples are the forward's own HIGHEST-precision full-width
    contractions, i.e. the exact values the streaming replay recomputes."""
    if u8:
        scene = Scene(
            volume=jnp.round(scene.volume * 255.0) / 255.0,
            importance=scene.importance,
            tf_lut=scene.tf_lut,
        )
    params = PARAMS.replace(u8_volume=u8)
    m = cam.matrices()
    vol_perm, feats, grad_perm, major, sign = _setup(scene, m, params)
    wvec = jnp.cos(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.1
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)
    with emulate(slab_kernel, slab_bwd_kernel):
        out, dens = slab_kernel._forward_call(
            params, sign, vol_perm, scene.tf_lut, feats,
            grad_perm=grad_perm, emit_density=True,
        )
        assert dens.shape[2] == 4  # density + 3 g-sample rows
        dv_s, dg_s, dl_s, df_s = slab_bwd_kernel.backward_shaded(
            params, major, sign, vol_perm, grad_perm, scene.tf_lut, feats,
            out, wvec, dens=dens,
        )
        dv_r, dg_r, dl_r, df_r = slab_bwd_kernel.backward_shaded(
            params, major, sign, vol_perm, grad_perm, scene.tf_lut, feats,
            out, wvec,
        )
    assert np.abs(np.asarray(dg_r)).max() > 0
    np.testing.assert_array_equal(np.asarray(dv_s), np.asarray(dv_r))
    np.testing.assert_array_equal(np.asarray(dg_s), np.asarray(dg_r))
    np.testing.assert_array_equal(np.asarray(dl_s), np.asarray(dl_r))
    np.testing.assert_array_equal(np.asarray(df_s), np.asarray(df_r))


def test_shaded_custom_vjp_uses_stored_and_matches_golden(scene, cam):
    """jax.grad through march_pallas_shaded (the production custom VJP,
    which now stores width-4 residuals) vs autodiff of the jnp golden."""
    m = cam.matrices()
    vol_perm, feats, grad_perm, major, sign = _setup(scene, m, PARAMS)
    assert slab_kernel._use_stored_density(PARAMS, feats, vol_perm.shape[0])
    wvec = jnp.cos(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.1
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)

    def loss(vp, gp, lut):
        out = slab_kernel.march_pallas_shaded(
            PARAMS, major, sign, 0, (), vp, gp, lut, feats, PARAMS.knobs()
        )
        return jnp.sum(out * wvec)

    with emulate(slab_kernel, slab_bwd_kernel):
        ga = jax.grad(loss, argnums=(0, 1, 2))(
            vol_perm, grad_perm, scene.tf_lut
        )

    from volym_tpu.render import rays as rays_mod

    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)
    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec.transpose(0, 2, 1).reshape(-1, 4))[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays

    def loss_jnp(vp, gp, lut):
        img = slab.march_slabs(
            vp, slab.permute_volume(scene.importance, major), lut, origin,
            dirs, entry, exit_, major, sign, PARAMS, gp,
        )
        return jnp.sum(img * jnp.asarray(w_img))

    gb = jax.grad(loss_jnp, argnums=(0, 1, 2))(
        vol_perm, grad_perm, scene.tf_lut
    )
    for name, a, b in zip(("d_vol", "d_grad", "d_lut"), gb, ga):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a).max() > 0 or name == "d_vol"
        np.testing.assert_allclose(b, a, atol=5e-3 * scale, rtol=5e-2)
