"""CI coverage for the integer-exact u8 streaming path (no TPU needed).

``RenderParams.u8_volume`` (VERDICT r4 item 7 — "HBM-resident uint8
voxel grid"): the kernels stream the density grid as bf16 raw 0..255
integers (2 bytes/voxel), run the sampling matmuls single-pass (both
operands exactly bf16-representable -> exact f32 accumulation), and
march in the scaled density domain (threshold x255, TF coordinate scale
ln/255).  These tests pin the path against the f32 kernels on a
u8-quantised volume through the eager emulator; Mosaic lowering is
covered on hardware by ``scripts/validate_slab_tpu.py``.
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
    use_shading=False,
    interpolation="trilinear",
    adaptive_stepping=False,
    raymarching_step_size=1.0 / 16.0,
    camera_grads=False,
)
U8 = PARAMS.replace(u8_volume=True)


@pytest.fixture(scope="module", autouse=True)
def _check_exact_hints():
    prev = slab_kernel.CHECK_EXACT_HINT
    slab_kernel.CHECK_EXACT_HINT = True
    yield
    slab_kernel.CHECK_EXACT_HINT = prev


@pytest.fixture(scope="module")
def scene():
    s = Scene.synthetic("sphere", side=16)
    # u8-quantise: the u8 path's contract (round(v*255)/255 == v)
    vol = jnp.round(s.volume * 255.0) / 255.0
    return Scene(volume=vol, importance=s.importance, tf_lut=s.tf_lut)


@pytest.fixture(scope="module")
def cam():
    return Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0)


def _fwd(scene, m, params, emit_density=False, grad=False):
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    grad_perm = (
        slab.permute_gradient(slab.gradient_volume(scene.volume), major)
        if grad
        else None
    )
    with emulate(slab_kernel):
        out = slab_kernel._forward_call(
            params, sign, vol_perm, scene.tf_lut, feats, None, grad_perm,
            emit_density=emit_density,
        )
    return out, (vol_perm, feats, grad_perm, major, sign)


def _close(a, b, name, bulk=2e-4, edge_frac=2e-3):
    """u8-vs-f32 comparison: bulk must agree tightly; a tiny knife-edge
    population (threshold-mask flips where the two exactness classes land
    on opposite sides of the kink) may differ by O(step) amounts."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(np.abs(a).max(), 1e-9)
    rel = np.abs(a - b) / scale
    frac_bad = (rel > 1e-3).mean()
    assert frac_bad <= edge_frac, f"{name}: {frac_bad:.2e} of entries differ"
    ok = rel <= 1e-3
    assert np.abs(a - b)[ok].max() <= bulk * scale + 1e-12, (
        f"{name}: bulk error {np.abs(a - b)[ok].max():.2e}"
    )


def test_u8_forward_matches_f32(scene, cam):
    m = cam.matrices()
    out8, _ = _fwd(scene, m, U8)
    out32, _ = _fwd(scene, m, PARAMS)
    assert float(jnp.abs(out32).max()) > 0.1
    _close(out32, out8, "forward image")


def test_u8_forward_shaded_matches_f32(scene, cam):
    m = cam.matrices()
    out8, _ = _fwd(scene, m, U8.replace(use_shading=True), grad=True)
    out32, _ = _fwd(scene, m, PARAMS.replace(use_shading=True), grad=True)
    _close(out32, out8, "shaded forward image")


def test_u8_nearest_matches_f32(scene, cam):
    m = cam.matrices()
    p8 = U8.replace(interpolation="nearest")
    p32 = PARAMS.replace(interpolation="nearest")
    out8, _ = _fwd(scene, m, p8)
    out32, _ = _fwd(scene, m, p32)
    _close(out32, out8, "nearest forward image")


def test_u8_backward_matches_f32(scene, cam):
    m = cam.matrices()
    out8, (vol_perm, feats, _, major, sign) = _fwd(scene, m, U8)
    out32, _ = _fwd(scene, m, PARAMS)
    wvec = jnp.cos(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.1
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)
    with emulate(slab_kernel, slab_bwd_kernel):
        dv8, dl8, _ = slab_bwd_kernel.backward(
            U8, major, sign, vol_perm, scene.tf_lut, feats, out8, wvec
        )
        dv32, dl32, _ = slab_bwd_kernel.backward(
            PARAMS, major, sign, vol_perm, scene.tf_lut, feats, out32, wvec
        )
    assert np.abs(np.asarray(dv32)).max() > 0
    _close(dv32, dv8, "d_vol", bulk=5e-4)
    _close(dl32, dl8, "d_lut", bulk=5e-4)


def test_u8_stored_density_backward_bitwise(scene, cam):
    """The stored-density replay must stay BITWISE equal to the
    recomputing replay under u8 (both run the same scaled single-pass
    contraction)."""
    m = cam.matrices()
    res, (vol_perm, feats, _, major, sign) = _fwd(
        scene, m, U8, emit_density=True
    )
    out, dens = res
    wvec = jnp.sin(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.05
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)
    with emulate(slab_kernel, slab_bwd_kernel):
        dv_s, dl_s, df_s = slab_bwd_kernel.backward(
            U8, major, sign, vol_perm, scene.tf_lut, feats, out, wvec,
            dens=dens,
        )
        dv_r, dl_r, df_r = slab_bwd_kernel.backward(
            U8, major, sign, vol_perm, scene.tf_lut, feats, out, wvec,
        )
    assert np.abs(np.asarray(dv_r)).max() > 0
    np.testing.assert_array_equal(np.asarray(dv_s), np.asarray(dv_r))
    np.testing.assert_array_equal(np.asarray(dl_s), np.asarray(dl_r))
    np.testing.assert_array_equal(np.asarray(df_s), np.asarray(df_r))


def test_u8_gate_respects_exclusions(scene, cam):
    """Camera grads / unsnapped hats silently fall back to the f32 path:
    identical results with the flag on or off."""
    m = cam.matrices()
    assert slab_kernel._u8_active(U8.replace(use_gaussian_smoothing=True))
    assert not slab_kernel._u8_active(U8.replace(camera_grads=True))
    assert not slab_kernel._u8_active(U8.replace(subtexel_bits=0))
    assert slab_kernel._u8_active(U8.replace(subtexel_bits=0, interpolation="nearest"))
    p8 = U8.replace(camera_grads=True)
    p32 = PARAMS.replace(camera_grads=True)
    out8, _ = _fwd(scene, m, p8)
    out32, _ = _fwd(scene, m, p32)
    np.testing.assert_array_equal(np.asarray(out8), np.asarray(out32))


def test_u8_smoothed_matches_f32(scene, cam):
    """Gaussian smoothing runs in the scaled domain (linear stencil with
    scale-invariant normalisation): u8 vs f32 parity, fwd and bwd."""
    m = cam.matrices()
    p8 = U8.replace(use_gaussian_smoothing=True)
    p32 = PARAMS.replace(use_gaussian_smoothing=True)
    out8, (vol_perm, feats, _, major, sign) = _fwd(scene, m, p8)
    out32, _ = _fwd(scene, m, p32)
    _close(out32, out8, "smoothed forward image")
    wvec = jnp.cos(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.1
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)
    with emulate(slab_kernel, slab_bwd_kernel):
        dv8, dl8, _ = slab_bwd_kernel.backward(
            p8, major, sign, vol_perm, scene.tf_lut, feats, out8, wvec
        )
        dv32, dl32, _ = slab_bwd_kernel.backward(
            p32, major, sign, vol_perm, scene.tf_lut, feats, out32, wvec
        )
    assert np.abs(np.asarray(dv32)).max() > 0
    _close(dv32, dv8, "smoothed d_vol", bulk=5e-4)
    _close(dl32, dl8, "smoothed d_lut", bulk=5e-4)


def test_u8_shaded_grad_field_stays_f32(scene, cam):
    """The gradient field is NOT u8-scaled (non-dyadic 0.01-offset tap
    blend): the shaded u8 forward must chain the f32 field — already
    covered by test_u8_forward_shaded_matches_f32; here pin that the
    shaded BACKWARD's d_grad is unscaled (compare against f32 path)."""
    m = cam.matrices()
    out8, (vol_perm, feats, grad_perm, major, sign) = _fwd(
        scene, m, U8.replace(use_shading=True), grad=True
    )
    out32, _ = _fwd(scene, m, PARAMS.replace(use_shading=True), grad=True)
    wvec = jnp.cos(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.1
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)
    with emulate(slab_kernel, slab_bwd_kernel):
        dv8, dg8, dl8, _ = slab_bwd_kernel.backward_shaded(
            U8, major, sign, vol_perm, grad_perm, scene.tf_lut, feats, out8,
            wvec,
        )
        dv32, dg32, dl32, _ = slab_bwd_kernel.backward_shaded(
            PARAMS, major, sign, vol_perm, grad_perm, scene.tf_lut, feats,
            out32, wvec,
        )
    assert np.abs(np.asarray(dg32)).max() > 0
    _close(dv32, dv8, "shaded d_vol", bulk=5e-4)
    _close(dg32, dg8, "d_grad", bulk=5e-4)
    _close(dl32, dl8, "shaded d_lut", bulk=5e-4)


def _lookahead_scene():
    side = 16
    vol = np.full((side, side, side), 0.45, np.float32)
    imp = np.zeros((side, side, side), np.float32)
    vol[10:13, 4:12, 4:12] = 0.9
    imp[10:13, 4:12, 4:12] = 1.0
    vol = np.asarray(jnp.round(jnp.asarray(vol) * 255.0) / 255.0)
    return Scene(
        volume=jnp.asarray(vol),
        importance=jnp.asarray(imp),
        tf_lut=Scene.synthetic("sphere", side=8).tf_lut,
    )


@pytest.mark.parametrize(
    "mode",
    ["coloring", "lookahead", "cone"],
)
def test_u8_importance_modes_match_f32(cam, mode):
    """u8 parity for the importance modes (the density grid is the only
    scaled operand; importance grids / ahead bits stay unscaled)."""
    from volym_tpu.ops import lookahead_kernel

    sc = _lookahead_scene()
    m = cam.matrices()
    kw = dict(
        coloring=dict(use_importance_coloring=True),
        lookahead=dict(use_importance_rendering=True),
        cone=dict(
            use_importance_rendering=True, use_cone_importance_check=True
        ),
    )[mode]
    p32 = PARAMS.replace(**kw)
    p8 = U8.replace(**kw)
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(sc.volume, major)
    imp_perm = slab.permute_volume(sc.importance, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )

    def run(p):
        lookahead = p.use_importance_rendering and not p.use_importance_coloring
        ahead = None
        with emulate(slab_kernel, lookahead_kernel):
            if lookahead:
                cone_feats = (
                    slab_kernel._chunk_rays(
                        slab_kernel._pack_cone_features(
                            m, RES, RES, vol_perm.shape[0], major, sign,
                            layout,
                        ),
                        RES, RES,
                    )
                    if p.use_cone_importance_check
                    else None
                )
                ahead = lookahead_kernel.lookahead_call(
                    sign, imp_perm, feats, cone_feats, 0,
                    subtexel=p.subtexel_bits,
                )
            return slab_kernel._forward_call(
                p, sign, vol_perm, sc.tf_lut, feats,
                imp_perm if (p.use_importance_coloring or lookahead) else None,
                None, 0, ahead,
            )

    out32 = run(p32)
    out8 = run(p8)
    assert float(jnp.abs(jnp.asarray(out32)).max()) > 0.1
    _close(out32, out8, f"{mode} forward")
