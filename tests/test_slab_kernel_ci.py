"""CI coverage for the Pallas slab kernels on CPU (no TPU needed).

Runs the *actual kernel bodies* (forward march, windowed contraction,
shading/coloring branches, two-pass backward) through the eager grid
emulator in :mod:`tests.pallas_emu`, validated against the jnp slab golden
(:mod:`volym_tpu.render.slab`).  A structural regression in any kernel
branch fails here in seconds; Mosaic lowering is covered on hardware by
``scripts/validate_slab_tpu.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.pallas_emu import emulate
from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_bwd_kernel, slab_kernel
from volym_tpu.render import slab

RES = 32  # one 32x32 pixel tile = exactly one ray chunk


@pytest.fixture(scope="module", autouse=True)
def _check_exact_hints():
    """The emulator runs kernel bodies eagerly (concrete values), so turn
    on kernel_dot's exact-hint verification: a wrong exact='a'/'b' side at
    any call site fails here instead of silently downgrading precision."""
    prev = slab_kernel.CHECK_EXACT_HINT
    slab_kernel.CHECK_EXACT_HINT = True
    yield
    slab_kernel.CHECK_EXACT_HINT = prev

PARAMS = RenderParams(
    use_gaussian_smoothing=False,
    use_shading=False,
    interpolation="trilinear",
    adaptive_stepping=False,
    # the slab-native step for the 16³ test scene (resolve_planes -> 16):
    # _emu_forward drives _forward_call directly (no step mapping), so the
    # golden must map to the identity plane count; planes != N coverage
    # lives in test_forward_step_size_planes_matches_golden
    raymarching_step_size=1.0 / 16.0,
)


@pytest.fixture(scope="module")
def scene():
    return Scene.synthetic("sphere", side=16)


@pytest.fixture(scope="module")
def cam():
    return Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0)


def _emu_forward(scene, m, params, height, width, win_rows=0):
    """Un-jitted replica of _render_pallas_jit running under the emulator."""
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, height, width, vol_perm.shape[0], major, sign, layout
    )
    imp_perm = (
        slab.permute_volume(scene.importance, major)
        if params.use_importance_coloring
        else None
    )
    grad_perm = (
        slab.permute_gradient(slab.gradient_volume(scene.volume), major)
        if params.use_shading
        else None
    )
    with emulate(slab_kernel):
        out = slab_kernel._forward_call(
            params, sign, vol_perm, scene.tf_lut, feats, imp_perm, grad_perm,
            win_rows,
        )
    return np.asarray(slab_kernel._assemble(out, miss, r, height, width))


def test_forward_matches_jnp_golden(scene, cam):
    m = cam.matrices()
    got = _emu_forward(scene, m, PARAMS, RES, RES)
    want = np.asarray(slab.render(scene, m, PARAMS, RES, RES))
    assert want[..., 3].max() > 0.1
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_forward_traced_knobs_drive_the_kernel(scene, cam):
    """The kernels read threshold/early-alpha from the traced knobs SMEM
    vector, NOT from the (zeroed) pallas_static jit key: passing the real
    values via knobs= with zeroed static floats must reproduce the
    static-float render, and a sky-high traced threshold must empty it."""
    import jax.numpy as jnp

    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    vol_perm = slab.permute_volume(scene.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, slab._AXIS_LAYOUT[major]
    )
    zeroed = PARAMS.pallas_static()
    assert zeroed.density_threshold == 0.0 and zeroed.early_termination_alpha == 0.0
    with emulate(slab_kernel):
        base = slab_kernel._forward_call(PARAMS, sign, vol_perm, scene.tf_lut, feats)
        via_knobs = slab_kernel._forward_call(
            zeroed, sign, vol_perm, scene.tf_lut, feats, knobs=PARAMS.knobs()
        )
        emptied = slab_kernel._forward_call(
            zeroed, sign, vol_perm, scene.tf_lut, feats,
            knobs=jnp.array([[2.0, 0.95]], jnp.float32),
        )
    np.testing.assert_allclose(np.asarray(via_knobs), np.asarray(base), atol=0)
    assert float(np.asarray(base)[:, 3].max()) > 0.1
    assert float(np.abs(np.asarray(emptied)).max()) == 0.0


def test_forward_nearest_filter(scene, cam):
    m = cam.matrices()
    p = PARAMS.replace(interpolation="nearest")
    got = _emu_forward(scene, m, p, RES, RES)
    want = np.asarray(slab.render(scene, m, p, RES, RES))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_forward_shading_branch(scene, cam):
    m = cam.matrices()
    p = PARAMS.replace(use_shading=True)
    got = _emu_forward(scene, m, p, RES, RES)
    want = np.asarray(slab.render(scene, m, p, RES, RES))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_forward_coloring_branch(scene, cam):
    m = cam.matrices()
    p = PARAMS.replace(use_importance_coloring=True)
    got = _emu_forward(scene, m, p, RES, RES)
    want = np.asarray(slab.render(scene, m, p, RES, RES))
    np.testing.assert_allclose(got, want, atol=1e-4)


def _lookahead_scene():
    side = 16
    vol = np.full((side, side, side), 0.45, np.float32)
    imp = np.zeros((side, side, side), np.float32)
    vol[10:13, 4:12, 4:12] = 0.9
    imp[10:13, 4:12, 4:12] = 1.0
    from volym_tpu.scene import Scene as S

    return S(
        volume=jnp.asarray(vol),
        importance=jnp.asarray(imp),
        tf_lut=Scene.synthetic("sphere", side=8).tf_lut,
    )


def _emu_lookahead_forward(sc, m, params):
    """Un-jitted lookahead render under the emulator (pre-pass + march)."""
    from volym_tpu.ops import lookahead_kernel

    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(sc.volume, major)
    imp_perm = slab.permute_volume(sc.importance, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    cone_feats = (
        slab_kernel._chunk_rays(
            slab_kernel._pack_cone_features(
                m, RES, RES, vol_perm.shape[0], major, sign, layout
            ),
            RES,
            RES,
        )
        if params.use_cone_importance_check
        else None
    )
    with emulate(slab_kernel, lookahead_kernel):
        ahead = lookahead_kernel.lookahead_call(sign, imp_perm, feats, cone_feats)
        out = slab_kernel._forward_call(
            params, sign, vol_perm, sc.tf_lut, feats, imp_perm, None, 0, ahead
        )
    return np.asarray(slab_kernel._assemble(out, miss, r, RES, RES))


@pytest.mark.parametrize("cone", [False, True])
def test_lookahead_matches_jnp_golden(cone):
    """Pallas pre-pass + march == jnp slab golden, straight and cone."""
    sc = _lookahead_scene()
    m = Camera(aspect=1.0, distance=1.3).orbit(10.0, 5.0, 0.0).matrices()
    p = PARAMS.replace(
        use_importance_rendering=True, use_cone_importance_check=cone
    )
    got = _emu_lookahead_forward(sc, m, p)
    want = np.asarray(slab.render(sc, m, p, RES, RES))
    base = np.asarray(slab.render(sc, m, PARAMS, RES, RES))
    assert np.abs(want - base).max() > 0.05, "look-ahead not engaged"
    err = np.abs(got - want).max(-1)
    assert (err > 1e-3).mean() <= 0.01, f"max err {err.max()}"


@pytest.mark.parametrize("interp", ["trilinear", "nearest"])
def test_gaussian_smoothing_matches_jnp_golden(scene, cam, interp):
    """Pallas batch-amortised smoothing stencil == jnp smoothed_densities.

    (With the nearest filter at side 16 every tap rounds to the centre
    slab, so smoothing is correctly the identity there; the trilinear
    case must visibly engage.)"""
    m = cam.matrices()
    p = PARAMS.replace(use_gaussian_smoothing=True, interpolation=interp)
    got = _emu_forward(scene, m, p, RES, RES)
    want = np.asarray(slab.render(scene, m, p, RES, RES))
    if interp == "trilinear":
        base = np.asarray(
            slab.render(scene, m, p.replace(use_gaussian_smoothing=False), RES, RES)
        )
        assert np.abs(want - base).max() > 1e-4, "smoothing not engaged"
    np.testing.assert_allclose(got, want, atol=1e-4)


def _banded_feats(rng=None):
    """One crafted ray chunk whose slab-rows footprint stays in a narrow
    band ([20, 38) over all 64 slabs) so a 32-row window provably covers
    it — a direct unit test of the windowed contraction mechanism."""
    rng = np.random.default_rng(7) if rng is None else rng
    R = slab_kernel.RAYS_PER_CHUNK
    feats = np.zeros((1, slab_kernel.N_FEATURES, R), np.float32)
    feats[0, slab_kernel.F_RS] = 0.02
    feats[0, slab_kernel.F_RB] = rng.uniform(20.0, 36.0, R)
    feats[0, slab_kernel.F_CS] = 0.03
    feats[0, slab_kernel.F_CB] = rng.uniform(5.0, 55.0, R)
    feats[0, slab_kernel.F_TS] = 0.012
    feats[0, slab_kernel.F_TB] = 0.1
    feats[0, slab_kernel.F_ENTRY] = 0.0
    feats[0, slab_kernel.F_EXIT] = 10.0
    feats[0, slab_kernel.F_AEXP] = 0.5
    feats[0, slab_kernel.F_SIGNOK] = 1.0
    return jnp.asarray(feats)


def test_forward_windowed_matches_full():
    """The windowed y-contraction must be exact when the footprint fits."""
    big = Scene.synthetic("sphere", side=64)
    vol_perm = slab.permute_volume(big.volume, 2)
    feats = _banded_feats()
    with emulate(slab_kernel):
        full = slab_kernel._forward_call(PARAMS, 1, vol_perm, big.tf_lut, feats)
        win = slab_kernel._forward_call(
            PARAMS, 1, vol_perm, big.tf_lut, feats, win_rows=32
        )
    full, win = np.asarray(full), np.asarray(win)
    assert full[0, 3].max() > 0.01, "banded rays miss all content"
    np.testing.assert_allclose(win, full, atol=1e-5)


def test_backward_windowed_matches_full():
    """Windowed + slab-batched backward == full-slice backward."""
    big = Scene.synthetic("sphere", side=64)
    vol_perm = slab.permute_volume(big.volume, 2)
    feats = _banded_feats()
    wvec = jnp.sin(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.05
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)
    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(PARAMS, 1, vol_perm, big.tf_lut, feats)
        dv_full, dl_full, df_full = slab_bwd_kernel.backward(
            PARAMS, 2, 1, vol_perm, big.tf_lut, feats, out, wvec, win_rows=0
        )
        dv_win, dl_win, df_win = slab_bwd_kernel.backward(
            PARAMS, 2, 1, vol_perm, big.tf_lut, feats, out, wvec, win_rows=32
        )
    assert np.abs(np.asarray(dv_full)).max() > 0
    np.testing.assert_allclose(np.asarray(dv_win), np.asarray(dv_full), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dl_win), np.asarray(dl_full), atol=1e-5)
    np.testing.assert_allclose(np.asarray(df_win), np.asarray(df_full), atol=1e-5)


def test_camera_cotangents_match_jnp_replay(scene, cam):
    """Pallas replay d_feats, pulled back through _pack_features, must
    equal the jnp replay VJP's camera gradients."""
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    w_img = jnp.cos(
        jnp.arange(RES * RES * 4, dtype=jnp.float32).reshape(RES, RES, 4) * 0.1
    )

    def loss_jnp(mm):
        img = slab._render_diff_jit(scene, mm, PARAMS, RES, RES, major, sign)
        return jnp.sum(img * w_img)

    g_ref = jax.grad(loss_jnp)(m)

    def feats_of(mm):
        return slab_kernel._chunked_feats(
            mm, RES, RES, vol_perm.shape[0], major, sign, layout
        )[0]

    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    # image-space cotangent -> chunk layout (zero for missed rays)
    w_rays = np.asarray(w_img).reshape(-1, 4)
    w_rays = np.where(np.asarray(miss)[:, None], 0.0, w_rays)
    order = slab_kernel._tile_order(RES, RES)
    if order is not None:
        w_rays = w_rays[order]
    g_chunk = jnp.asarray(
        w_rays.T.reshape(4, -1, slab_kernel.RAYS_PER_CHUNK).transpose(1, 0, 2)
    )

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(PARAMS, sign, vol_perm, scene.tf_lut, feats)
        _, _, d_feats = slab_bwd_kernel.backward(
            PARAMS, major, sign, vol_perm, scene.tf_lut, feats, out, g_chunk
        )
    _, vjp_fn = jax.vjp(feats_of, m)
    (g_pal,) = vjp_fn(d_feats)

    leaves_ref = jax.tree_util.tree_leaves(g_ref)
    leaves_pal = jax.tree_util.tree_leaves(g_pal)
    assert max(np.abs(np.asarray(l)).max() for l in leaves_ref) > 0
    for a, b in zip(leaves_ref, leaves_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=5e-3 * scale, rtol=5e-2)


def test_window_rows_static_choice():
    """window_rows: production configs get a window; degenerate ones don't."""
    cam256 = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0)
    m = cam256.matrices()
    major, sign = slab.dominant_axis(m)
    win = slab_kernel.window_rows(m, 256, 256, 256, major, sign)
    assert win and win % 8 == 0 and win < 256
    # untiled image: no window
    assert slab_kernel.window_rows(m, 100, 100, 256, major, sign) == 0


def test_backward_kernels_match_autodiff(scene, cam):
    """Replay + voxel-grad Pallas passes vs autodiff of the jnp golden."""
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.1
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(PARAMS, sign, vol_perm, scene.tf_lut, feats)
        d_vol, d_lut, _ = slab_bwd_kernel.backward(
            PARAMS, major, sign, vol_perm, scene.tf_lut, feats, out, wvec
        )

    # reference: autodiff of the jnp slab march under the same loss.  Map the
    # chunked weight back to per-ray layout (inverse of _chunked_feats).
    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec.transpose(0, 2, 1).reshape(-1, 4))[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays

    from volym_tpu.render import rays as rays_mod

    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(vp, lut):
        img = slab.march_slabs(
            vp, slab.permute_volume(scene.importance, major), lut, origin,
            dirs, entry, exit_, major, sign, PARAMS,
        )
        return jnp.sum(img * jnp.asarray(w_img))

    ga_vol, ga_lut = jax.grad(loss, argnums=(0, 1))(vol_perm, scene.tf_lut)
    for name, a, b in (("d_vol", ga_vol, d_vol), ("d_lut", ga_lut, d_lut)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, atol=3e-3 * scale, rtol=2e-2, err_msg=name
        )
    assert np.abs(np.asarray(ga_vol)).max() > 0


def test_shaded_backward_matches_autodiff(scene, cam):
    """Pallas shaded replay: d_vol + d_grad_perm + d_lut vs autodiff of the
    jnp slab golden with (vol_perm, grad_perm, lut) independent inputs."""
    from volym_tpu.render import rays as rays_mod

    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_shading=True)
    vol_perm = slab.permute_volume(scene.volume, major)
    grad_perm = slab.permute_gradient(slab.gradient_volume(scene.volume), major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.1
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(
            p, sign, vol_perm, scene.tf_lut, feats, grad_perm=grad_perm
        )
        d_vol, d_grad, d_lut, d_feats = slab_bwd_kernel.backward_shaded(
            p, major, sign, vol_perm, grad_perm, scene.tf_lut, feats, out, wvec
        )

    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec).transpose(0, 2, 1).reshape(-1, 4)[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays

    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(vp, gp, lut):
        img = slab.march_slabs(
            vp, slab.permute_volume(scene.importance, major), lut, origin,
            dirs, entry, exit_, major, sign, p, gp,
        )
        return jnp.sum(img * jnp.asarray(w_img))

    ga_vol, ga_grad, ga_lut = jax.grad(loss, argnums=(0, 1, 2))(
        vol_perm, grad_perm, scene.tf_lut
    )
    assert np.abs(np.asarray(ga_grad)).max() > 0, "shading gradient inactive"
    for name, a, b in (
        ("d_vol", ga_vol, d_vol),
        ("d_grad", ga_grad, d_grad),
        ("d_lut", ga_lut, d_lut),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, atol=3e-3 * scale, rtol=2e-2, err_msg=name
        )


def test_shaded_camera_cotangents_match_jnp_replay(scene, cam):
    """Shaded-mode d_feats (incl. the half-vector rows) pulled back through
    _pack_features must equal the jnp shaded replay's camera gradients."""
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_shading=True)
    vol_perm = slab.permute_volume(scene.volume, major)
    grad_perm = slab.permute_gradient(slab.gradient_volume(scene.volume), major)
    w_img = jnp.cos(
        jnp.arange(RES * RES * 4, dtype=jnp.float32).reshape(RES, RES, 4) * 0.1
    )

    def loss_jnp(mm):
        img = slab._render_diff_jit(scene, mm, p, RES, RES, major, sign)
        return jnp.sum(img * w_img)

    g_ref = jax.grad(loss_jnp)(m)

    def feats_of(mm):
        return slab_kernel._chunked_feats(
            mm, RES, RES, vol_perm.shape[0], major, sign, layout
        )[0]

    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    w_rays = np.asarray(w_img).reshape(-1, 4)
    w_rays = np.where(np.asarray(miss)[:, None], 0.0, w_rays)
    order = slab_kernel._tile_order(RES, RES)
    if order is not None:
        w_rays = w_rays[order]
    g_chunk = jnp.asarray(
        w_rays.T.reshape(4, -1, slab_kernel.RAYS_PER_CHUNK).transpose(1, 0, 2)
    )

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(
            p, sign, vol_perm, scene.tf_lut, feats, grad_perm=grad_perm
        )
        _, _, _, d_feats = slab_bwd_kernel.backward_shaded(
            p, major, sign, vol_perm, grad_perm, scene.tf_lut, feats, out,
            g_chunk,
        )
    _, vjp_fn = jax.vjp(feats_of, m)
    (g_pal,) = vjp_fn(d_feats)

    leaves_ref = jax.tree_util.tree_leaves(g_ref)
    leaves_pal = jax.tree_util.tree_leaves(g_pal)
    assert max(np.abs(np.asarray(l)).max() for l in leaves_ref) > 0
    for a, b in zip(leaves_ref, leaves_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=5e-3 * scale, rtol=5e-2)


def test_coloring_backward_matches_autodiff(scene, cam):
    """Pallas coloring replay: d_importance (+ zero d_vol) vs autodiff of
    the jnp slab golden."""
    from volym_tpu.render import rays as rays_mod

    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_importance_coloring=True)
    vol_perm = slab.permute_volume(scene.volume, major)
    # a non-trivial importance field (box-filtered -> piecewise constant)
    imp = jnp.asarray(
        (np.asarray(scene.volume) > 0.3).astype(np.float32) * 0.8
    )
    imp_perm = slab.permute_volume(imp, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.07
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(
            p, sign, vol_perm, scene.tf_lut, feats, imp_perm=imp_perm
        )
        d_imp, d_feats = slab_bwd_kernel.backward_coloring(
            p, major, sign, vol_perm, imp_perm, feats, out, wvec
        )

    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec).transpose(0, 2, 1).reshape(-1, 4)[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays

    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(vp, ip):
        img = slab.march_slabs(
            vp, ip, scene.tf_lut, origin, dirs, entry, exit_, major, sign, p
        )
        return jnp.sum(img * jnp.asarray(w_img))

    ga_vol, ga_imp = jax.grad(loss, argnums=(0, 1))(vol_perm, imp_perm)
    assert np.abs(np.asarray(ga_vol)).max() < 1e-6  # zero a.e. in this mode
    a, b = np.asarray(ga_imp), np.asarray(d_imp)
    scale = max(np.abs(a).max(), 1e-6)
    assert scale > 1e-5
    np.testing.assert_allclose(b, a, atol=3e-3 * scale, rtol=2e-2)


@pytest.mark.parametrize("shading", [False, True])
def test_lookahead_backward_matches_autodiff(shading):
    """Look-ahead-gated Pallas replay (base and shaded): gradients vs
    autodiff of the jnp slab golden under the same gate."""
    from volym_tpu.ops import lookahead_kernel
    from volym_tpu.render import rays as rays_mod

    sc = _lookahead_scene()
    m = Camera(aspect=1.0, distance=1.3).orbit(10.0, 5.0, 0.0).matrices()
    p = PARAMS.replace(use_importance_rendering=True, use_shading=shading)
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(sc.volume, major)
    imp_perm = slab.permute_volume(sc.importance, major)
    grad_perm = (
        slab.permute_gradient(slab.gradient_volume(sc.volume), major)
        if shading
        else None
    )
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.1
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)

    with emulate(slab_kernel, slab_bwd_kernel, lookahead_kernel):
        ahead = lookahead_kernel.lookahead_call(sign, imp_perm, feats)
        out = slab_kernel._forward_call(
            p, sign, vol_perm, sc.tf_lut, feats, imp_perm=imp_perm,
            grad_perm=grad_perm, ahead=ahead,
        )
        if shading:
            d_vol, d_grad, d_lut, d_feats = slab_bwd_kernel.backward_shaded(
                p, major, sign, vol_perm, grad_perm, sc.tf_lut, feats, out,
                wvec, imp_perm=imp_perm, ahead=ahead,
            )
        else:
            d_vol, d_lut, d_feats = slab_bwd_kernel.backward(
                p, major, sign, vol_perm, sc.tf_lut, feats, out, wvec,
                imp_perm=imp_perm, ahead=ahead,
            )

    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec).transpose(0, 2, 1).reshape(-1, 4)[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays

    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(vp, lut, *gp):
        img = slab.march_slabs(
            vp, imp_perm, lut, origin, dirs, entry, exit_, major, sign, p,
            *gp,
        )
        return jnp.sum(img * jnp.asarray(w_img))

    # the gate must actually engage (otherwise this test is the base test)
    gated = np.asarray(
        slab.march_slabs(
            vol_perm, imp_perm, sc.tf_lut, origin, dirs, entry, exit_, major,
            sign, p, grad_perm,
        )
    )
    ungated = np.asarray(
        slab.march_slabs(
            vol_perm, imp_perm, sc.tf_lut, origin, dirs, entry, exit_, major,
            sign, p.replace(use_importance_rendering=False), grad_perm,
        )
    )
    assert np.abs(gated - ungated).max() > 0.05, "look-ahead not engaged"

    args = (vol_perm, sc.tf_lut) + ((grad_perm,) if shading else ())
    grads = jax.grad(loss, argnums=tuple(range(len(args))))(*args)
    ga_vol, ga_lut = grads[0], grads[1]
    pairs = [("d_vol", ga_vol, d_vol), ("d_lut", ga_lut, d_lut)]
    if shading:
        pairs.append(("d_grad", grads[2], d_grad))
    for name, a, b in pairs:
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, atol=3e-3 * scale, rtol=2e-2, err_msg=name
        )
    assert np.abs(np.asarray(ga_vol)).max() > 0


@pytest.mark.parametrize("interp", ["trilinear", "nearest"])
def test_smoothing_backward_matches_autodiff(scene, cam, interp):
    """Gaussian-smoothed Pallas backward (replay + stencil transpose +
    voxel-grad) vs autodiff of the jnp slab golden."""
    from volym_tpu.render import rays as rays_mod

    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_gaussian_smoothing=True, interpolation=interp)
    vol_perm = slab.permute_volume(scene.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.1
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(p, sign, vol_perm, scene.tf_lut, feats)
        d_vol, d_lut, d_feats = slab_bwd_kernel.backward(
            p, major, sign, vol_perm, scene.tf_lut, feats, out, wvec
        )

    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec).transpose(0, 2, 1).reshape(-1, 4)[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays

    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(vp, lut):
        img = slab.march_slabs(
            vp, slab.permute_volume(scene.importance, major), lut, origin,
            dirs, entry, exit_, major, sign, p,
        )
        return jnp.sum(img * jnp.asarray(w_img))

    ga_vol, ga_lut = jax.grad(loss, argnums=(0, 1))(vol_perm, scene.tf_lut)
    for name, a, b in (("d_vol", ga_vol, d_vol), ("d_lut", ga_lut, d_lut)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, atol=3e-3 * scale, rtol=2e-2, err_msg=name
        )
    assert np.abs(np.asarray(ga_vol)).max() > 0


def test_smoothing_camera_cotangents_match_jnp_replay(scene, cam):
    """Smoothed-mode d_feats (rows/cols via pass 2b + the F_TS tap-offset
    chain) pulled back through _pack_features vs the jnp replay VJP."""
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_gaussian_smoothing=True)
    vol_perm = slab.permute_volume(scene.volume, major)
    w_img = jnp.cos(
        jnp.arange(RES * RES * 4, dtype=jnp.float32).reshape(RES, RES, 4) * 0.1
    )

    def loss_jnp(mm):
        img = slab._render_diff_jit(scene, mm, p, RES, RES, major, sign)
        return jnp.sum(img * w_img)

    g_ref = jax.grad(loss_jnp)(m)

    def feats_of(mm):
        return slab_kernel._chunked_feats(
            mm, RES, RES, vol_perm.shape[0], major, sign, layout
        )[0]

    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    w_rays = np.asarray(w_img).reshape(-1, 4)
    w_rays = np.where(np.asarray(miss)[:, None], 0.0, w_rays)
    order = slab_kernel._tile_order(RES, RES)
    if order is not None:
        w_rays = w_rays[order]
    g_chunk = jnp.asarray(
        w_rays.T.reshape(4, -1, slab_kernel.RAYS_PER_CHUNK).transpose(1, 0, 2)
    )

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(p, sign, vol_perm, scene.tf_lut, feats)
        _, _, d_feats = slab_bwd_kernel.backward(
            p, major, sign, vol_perm, scene.tf_lut, feats, out, g_chunk
        )
    _, vjp_fn = jax.vjp(feats_of, m)
    (g_pal,) = vjp_fn(d_feats)

    leaves_ref = jax.tree_util.tree_leaves(g_ref)
    leaves_pal = jax.tree_util.tree_leaves(g_pal)
    assert max(np.abs(np.asarray(l)).max() for l in leaves_ref) > 0
    for a, b in zip(leaves_ref, leaves_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=5e-3 * scale, rtol=5e-2)


def test_smoothing_shaded_backward_matches_autodiff(scene, cam):
    """Smoothing + Blinn-Phong shading through the Pallas backward."""
    from volym_tpu.render import rays as rays_mod

    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_gaussian_smoothing=True, use_shading=True)
    vol_perm = slab.permute_volume(scene.volume, major)
    grad_perm = slab.permute_gradient(slab.gradient_volume(scene.volume), major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.1
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(
            p, sign, vol_perm, scene.tf_lut, feats, grad_perm=grad_perm
        )
        d_vol, d_grad, d_lut, d_feats = slab_bwd_kernel.backward_shaded(
            p, major, sign, vol_perm, grad_perm, scene.tf_lut, feats, out, wvec
        )

    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec).transpose(0, 2, 1).reshape(-1, 4)[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays

    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(vp, gp, lut):
        img = slab.march_slabs(
            vp, slab.permute_volume(scene.importance, major), lut, origin,
            dirs, entry, exit_, major, sign, p, gp,
        )
        return jnp.sum(img * jnp.asarray(w_img))

    ga_vol, ga_grad, ga_lut = jax.grad(loss, argnums=(0, 1, 2))(
        vol_perm, grad_perm, scene.tf_lut
    )
    assert np.abs(np.asarray(ga_grad)).max() > 0
    for name, a, b in (
        ("d_vol", ga_vol, d_vol),
        ("d_grad", ga_grad, d_grad),
        ("d_lut", ga_lut, d_lut),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, atol=3e-3 * scale, rtol=2e-2, err_msg=name
        )


def test_smoothing_coloring_backward_matches_autodiff(scene, cam):
    """Smoothing + importance coloring: the smoothed density moves only the
    threshold mask; d_importance must match autodiff under that mask."""
    from volym_tpu.render import rays as rays_mod

    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_gaussian_smoothing=True, use_importance_coloring=True)
    vol_perm = slab.permute_volume(scene.volume, major)
    imp = jnp.asarray((np.asarray(scene.volume) > 0.3).astype(np.float32) * 0.8)
    imp_perm = slab.permute_volume(imp, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.07
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(
            p, sign, vol_perm, scene.tf_lut, feats, imp_perm=imp_perm
        )
        d_imp, d_feats = slab_bwd_kernel.backward_coloring(
            p, major, sign, vol_perm, imp_perm, feats, out, wvec
        )

    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec).transpose(0, 2, 1).reshape(-1, 4)[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays

    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(ip):
        img = slab.march_slabs(
            vol_perm, ip, scene.tf_lut, origin, dirs, entry, exit_, major,
            sign, p,
        )
        return jnp.sum(img * jnp.asarray(w_img))

    ga_imp = jax.grad(loss)(imp_perm)
    a, b = np.asarray(ga_imp), np.asarray(d_imp)
    scale = max(np.abs(a).max(), 1e-6)
    assert scale > 1e-5
    np.testing.assert_allclose(b, a, atol=3e-3 * scale, rtol=2e-2)


@pytest.mark.parametrize("shading", [False, True])
def test_camera_grads_flag(scene, cam, shading):
    """camera_grads=False: identical d_volume/d_lut, exactly-zero d_feats
    (the scene-fitting fast path skips the dhat chains)."""
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_shading=shading)
    vol_perm = slab.permute_volume(scene.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.1
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)

    grad_perm = (
        slab.permute_gradient(slab.gradient_volume(scene.volume), major)
        if shading
        else None
    )
    outs = {}
    for cg in (True, False):
        pp = p.replace(camera_grads=cg)
        with emulate(slab_kernel, slab_bwd_kernel):
            if shading:
                out = slab_kernel._forward_call(
                    pp, sign, vol_perm, scene.tf_lut, feats, None, grad_perm
                )
                d_vol, d_grad, d_lut, d_feats = slab_bwd_kernel.backward_shaded(
                    pp, major, sign, vol_perm, grad_perm, scene.tf_lut,
                    feats, out, wvec,
                )
            else:
                out = slab_kernel._forward_call(pp, sign, vol_perm, scene.tf_lut, feats)
                d_vol, d_lut, d_feats = slab_bwd_kernel.backward(
                    pp, major, sign, vol_perm, scene.tf_lut, feats, out, wvec
                )
        outs[cg] = (np.asarray(d_vol), np.asarray(d_lut), np.asarray(d_feats))

    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_array_equal(outs[False][1], outs[True][1])
    assert np.abs(outs[True][2]).max() > 0  # chains actually exercised
    np.testing.assert_array_equal(outs[False][2], 0.0)


def test_inverted_grid_matches_chunk_outer(cam):
    """The slab-outer (inverted) grid with aliased accumulators must be
    bit-identical to the chunk-outer grid: forward, both backward passes,
    and the look-ahead pre-pass, on a >= INVERT_MIN_CHUNKS render."""
    from volym_tpu.ops import lookahead_kernel

    res = 96  # 9 chunks of 32x32 rays > INVERT_MIN_CHUNKS
    sc = _lookahead_scene()
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(sc.volume, major)
    imp_perm = slab.permute_volume(sc.importance, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, res, res, vol_perm.shape[0], major, sign, layout
    )
    assert feats.shape[0] >= slab_kernel.INVERT_MIN_CHUNKS
    wvec = jnp.cos(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.1
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)

    outs = {}
    orig = slab_kernel.INVERT_MIN_CHUNKS
    for label, floor in (("inverted", orig), ("chunk_outer", 10**9)):
        slab_kernel.INVERT_MIN_CHUNKS = floor
        try:
            with emulate(slab_kernel, slab_bwd_kernel, lookahead_kernel):
                ahead = lookahead_kernel.lookahead_call(sign, imp_perm, feats)
                out = slab_kernel._forward_call(
                    PARAMS, sign, vol_perm, sc.tf_lut, feats
                )
                d_vol, d_lut, d_feats = slab_bwd_kernel.backward(
                    PARAMS, major, sign, vol_perm, sc.tf_lut, feats, out, wvec
                )
            outs[label] = tuple(
                np.asarray(x) for x in (ahead, out, d_vol, d_lut, d_feats)
            )
        finally:
            slab_kernel.INVERT_MIN_CHUNKS = orig

    names = ("ahead", "out", "d_vol", "d_lut", "d_feats")
    assert outs["chunk_outer"][1][:, 3].max() > 0.01, "rays miss all content"
    assert np.abs(outs["chunk_outer"][2]).max() > 0
    for name, a, b in zip(names, outs["inverted"], outs["chunk_outer"]):
        if name == "d_lut":
            # the shared LUT accumulator sums iterations in a different
            # order (j-outer vs c-outer) -> f32 non-associativity only
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_smoothing_occupancy_skip_is_exact(cam):
    """The dilated-occupancy skip under Gaussian smoothing (64^3 engages
    the 32-texel occupancy blocks) must not change forward or gradients
    vs the same kernels with the skip neutralised (all-occupied grid)."""
    big = Scene.synthetic("sphere", side=64)
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_gaussian_smoothing=True)
    vol_perm = slab.permute_volume(big.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.1
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)

    outs = {}
    for neutered in (False, True):
        orig = slab_kernel.occupancy_grid_smooth
        if neutered:
            slab_kernel.occupancy_grid_smooth = lambda v, t: jnp.ones_like(
                orig(v, t)
            )
        try:
            with emulate(slab_kernel, slab_bwd_kernel):
                out = slab_kernel._forward_call(
                    p, sign, vol_perm, big.tf_lut, feats
                )
                d_vol, d_lut, _ = slab_bwd_kernel.backward(
                    p, major, sign, vol_perm, big.tf_lut, feats, out, wvec
                )
            outs[neutered] = (np.asarray(out), np.asarray(d_vol), np.asarray(d_lut))
        finally:
            slab_kernel.occupancy_grid_smooth = orig

    # the skip must actually engage on the sparse sphere
    occ = np.asarray(slab_kernel.occupancy_grid_smooth(vol_perm, p.density_threshold))
    assert occ.mean() < 0.9
    assert outs[True][0][0, 3].max() > 0.01, "rays miss all content"
    for a, b, name in zip(outs[False], outs[True], ("out", "d_vol", "d_lut")):
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)


def test_build_step_meta_matches_per_step(cam):
    """The once-per-frame XLA step meta (build_step_meta) must agree
    exactly with straightforward per-step evaluations of the same
    semantics — the footprint-vs-occupancy flag and the window start —
    including the smoothing halo extension of the r0 list."""
    sc = Scene.synthetic("sphere", side=64)  # 64^3: occupancy blocks engage
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(sc.volume, major)
    n_slabs, nr, nc = vol_perm.shape
    feats, miss, r = slab_kernel._chunked_feats(
        m, 32, 32, n_slabs, major, sign, layout
    )
    occ = np.asarray(slab_kernel.occupancy_grid(vol_perm, 0.12))
    sb = 8
    win = 8  # any multiple of 8 <= nr
    halo = slab_kernel.SMOOTH_HALO
    blk = slab_kernel.OCC_BLOCK
    meta = np.asarray(
        slab_kernel.build_step_meta(
            feats, jnp.asarray(occ), n_slabs=n_slabs, sb=sb, sign=sign,
            nr=nr, nc=nc, margin=1.0, win_rows=win, halo=halo,
        )
    )
    assert meta.shape == (
        feats.shape[0], n_slabs // sb, 1, 1 + sb + sb + 2 * halo
    )
    meta = meta[:, :, 0, :]

    feats = np.asarray(feats)
    F = slab_kernel

    def ray_state(feat, j, widen=0.0):
        jf = float(j)
        rows = np.clip(feat[F.F_RS] * jf + feat[F.F_RB], 0.0, nr - 1.0)
        cols = np.clip(feat[F.F_CS] * jf + feat[F.F_CB], 0.0, nc - 1.0)
        t = feat[F.F_TS] * jf + feat[F.F_TB]
        slack = np.abs(feat[F.F_TS]) * widen
        active = (
            (feat[F.F_SIGNOK] > 0.5)
            & (t >= feat[F.F_ENTRY] - slack)
            & (t < feat[F.F_EXIT] + slack)
        )
        return rows, cols, active

    for c in range(feats.shape[0]):
        feat = feats[c]
        for jb in range(n_slabs // sb):
            for i in range(sb):
                j = jb * sb + i
                rows, cols, active = ray_state(feat, j)
                slab_phys = j if sign > 0 else n_slabs - 1 - j
                ob = occ[slab_phys] > 0.5
                if not active.any():
                    want = False
                else:
                    rlo = rows[active].min() - 1.0
                    rhi = rows[active].max() + 1.0
                    clo = cols[active].min() - 1.0
                    chi = cols[active].max() + 1.0
                    by = np.arange(ob.shape[0]) * blk
                    bx = np.arange(ob.shape[1]) * blk
                    inside = (
                        ((by + blk - 1 >= rlo) & (by <= rhi))[:, None]
                        & ((bx + blk - 1 >= clo) & (bx <= chi))[None, :]
                    )
                    want = bool((ob & inside).any())
                assert bool(meta[c, jb, 1 + i]) == want, (c, jb, i)
            assert bool(meta[c, jb, 0]) == any(
                meta[c, jb, 1 : 1 + sb] > 0
            ), (c, jb)
            # halo > 0 widens the window-placement activity interval by
            # halo*|ts| (smoothing-stencil readers past a ray's exit)
            for off in range(-halo, sb + halo):
                j = jb * sb + off
                rows, _, act_w = ray_state(feat, j, widen=float(halo))
                rows_min = rows[act_w].min() if act_w.any() else float(nr)
                want_r0 = int(
                    np.clip(np.floor((rows_min - 1.0) / 8.0) * 8.0, 0, nr - win)
                )
                got = int(meta[c, jb, 1 + sb + off + halo])
                assert got == want_r0, (c, jb, off)


def test_windowed_smoothing_boundary_rays():
    """Gaussian smoothing + windowed contraction must match the unwindowed
    smoothed forward/backward even for rays that EXIT mid-march: their
    stencil still reads plain rows up to SMOOTH_HALO slabs past the exit,
    where exact-activity window placement would exclude them (the bug the
    halo-widened placement mask fixes).  Crafted chunk: group A rows ~20,
    exiting at slab 32; group B rows ~45, marching the whole way — at
    slabs 32..34 exact placement follows B only and a 40-row window
    drops A's taps."""
    K = slab_kernel
    big = Scene.synthetic("sphere", side=64)
    # empty except a dense band straddling group A's exit slab, so no ray
    # saturates before the boundary and the mid-band taps carry signal
    vol = np.zeros((64, 64, 64), np.float32)
    vol[30:38] = 0.6
    vol_perm = jnp.asarray(vol)
    R = K.RAYS_PER_CHUNK
    half = R // 2
    feats = np.zeros((1, K.N_FEATURES, R), np.float32)
    feats[0, K.F_RS] = 0.0
    feats[0, K.F_RB, :half] = 20.0 + np.linspace(0.0, 2.0, half)
    feats[0, K.F_RB, half:] = 45.0 + np.linspace(0.0, 2.0, half)
    feats[0, K.F_CS] = 0.01
    feats[0, K.F_CB] = 30.0
    feats[0, K.F_TS] = 0.01
    feats[0, K.F_TB] = 0.0
    feats[0, K.F_ENTRY] = 0.0
    feats[0, K.F_EXIT, :half] = 0.01 * 32  # group A dies at slab 32
    feats[0, K.F_EXIT, half:] = 10.0
    feats[0, K.F_AEXP] = 0.5
    feats[0, K.F_SIGNOK] = 1.0
    feats = jnp.asarray(feats)
    p = PARAMS.replace(use_gaussian_smoothing=True)

    outs = {}
    with emulate(slab_kernel):
        for w in (0, 40):
            outs[w] = np.asarray(
                K._forward_call(p, 1, vol_perm, big.tf_lut, feats, win_rows=w)
            )
    assert outs[0][0, 3].max() > 0.01, "rays miss all content"
    np.testing.assert_allclose(outs[40], outs[0], atol=1e-5)

    wvec = jnp.cos(
        jnp.arange(4 * R, dtype=jnp.float32) * 0.1
    ).reshape(1, 4, R)
    grads = {}
    for w in (0, 40):
        with emulate(slab_kernel, slab_bwd_kernel):
            grads[w] = tuple(
                np.asarray(x) for x in slab_bwd_kernel.backward(
                    p, 2, 1, vol_perm, big.tf_lut, feats,
                    jnp.asarray(outs[0]), wvec, win_rows=w,
                )
            )
    assert np.abs(grads[0][0]).max() > 0
    for name, a, b in zip(("d_vol", "d_lut", "d_feats"), grads[40], grads[0]):
        np.testing.assert_allclose(a, b, atol=2e-5, err_msg=name)


def test_coloring_shading_backward_matches_autodiff(scene, cam):
    """Coloring + shading combined (Pallas diff): d_importance and
    d_grad_perm vs autodiff of the jnp slab golden.  The direct volume
    cotangent is zero a.e. (density only gates the threshold mask; the
    volume chain flows through gradient_volume outside)."""
    from volym_tpu.render import rays as rays_mod

    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    p = PARAMS.replace(use_importance_coloring=True, use_shading=True)
    vol_perm = slab.permute_volume(scene.volume, major)
    grad_perm = slab.permute_gradient(slab.gradient_volume(scene.volume), major)
    imp = jnp.asarray((np.asarray(scene.volume) > 0.3).astype(np.float32) * 0.8)
    imp_perm = slab.permute_volume(imp, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.09
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)

    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(
            p, sign, vol_perm, scene.tf_lut, feats, imp_perm=imp_perm,
            grad_perm=grad_perm,
        )
        d_imp, d_grad, d_feats = slab_bwd_kernel.backward_coloring(
            p, major, sign, vol_perm, imp_perm, feats, out, wvec,
            grad_perm=grad_perm,
        )

    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec).transpose(0, 2, 1).reshape(-1, 4)[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays

    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(ip, gp):
        img = slab.march_slabs(
            vol_perm, ip, scene.tf_lut, origin, dirs, entry, exit_, major,
            sign, p, gp,
        )
        return jnp.sum(img * jnp.asarray(w_img))

    ga_imp, ga_grad = jax.grad(loss, argnums=(0, 1))(imp_perm, grad_perm)
    assert np.abs(np.asarray(ga_grad)).max() > 0, "shading gradient inactive"
    assert np.abs(np.asarray(ga_imp)).max() > 1e-5, "coloring gradient inactive"
    for name, a, b in (("d_imp", ga_imp, d_imp), ("d_grad", ga_grad, d_grad)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, atol=3e-3 * scale, rtol=2e-2, err_msg=name
        )


def test_first_hit_matches_jnp_golden(scene, cam):
    """use_opacity=False (first-hit-then-break, wgsl:319-323) in the Pallas
    kernel == the jnp slab golden; and it must genuinely differ from
    alpha compositing."""
    m = cam.matrices()
    p = PARAMS.replace(use_opacity=False)
    got = _emu_forward(scene, m, p, RES, RES)
    want = np.asarray(slab.render(scene, m, p, RES, RES))
    base = np.asarray(slab.render(scene, m, PARAMS, RES, RES))
    assert np.abs(want - base).max() > 0.05, "first-hit not engaged"
    hits = want[..., 3] > 0.99
    assert hits.any() and not hits.all()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_first_hit_shaded_matches_jnp_golden(scene, cam):
    m = cam.matrices()
    p = PARAMS.replace(use_opacity=False, use_shading=True)
    got = _emu_forward(scene, m, p, RES, RES)
    want = np.asarray(slab.render(scene, m, p, RES, RES))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_inverted_fused_shaded_matches_chunk_outer(cam):
    """The fused pass-2 scatter (inverted grid) must match the two-pass
    chunk-outer backward in the SHADED mode too: d_vol, d_grad, d_lut,
    d_feats on a >= INVERT_MIN_CHUNKS render."""
    res = 96
    sc = Scene.synthetic("sphere", side=64)
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(sc.volume, major)
    grad_perm = slab.permute_gradient(slab.gradient_volume(sc.volume), major)
    p = PARAMS.replace(use_shading=True)
    feats, miss, r = slab_kernel._chunked_feats(
        m, res, res, vol_perm.shape[0], major, sign, layout
    )
    assert feats.shape[0] >= slab_kernel.INVERT_MIN_CHUNKS
    wvec = jnp.sin(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.13
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)

    outs = {}
    orig = slab_kernel.INVERT_MIN_CHUNKS
    for label, floor in (("inverted", orig), ("chunk_outer", 10**9)):
        slab_kernel.INVERT_MIN_CHUNKS = floor
        try:
            with emulate(slab_kernel, slab_bwd_kernel):
                out = slab_kernel._forward_call(
                    p, sign, vol_perm, sc.tf_lut, feats, grad_perm=grad_perm
                )
                grads = slab_bwd_kernel.backward_shaded(
                    p, major, sign, vol_perm, grad_perm, sc.tf_lut, feats,
                    out, wvec,
                )
            outs[label] = tuple(np.asarray(x) for x in (out,) + tuple(grads))
        finally:
            slab_kernel.INVERT_MIN_CHUNKS = orig

    names = ("out", "d_vol", "d_grad", "d_lut", "d_feats")
    assert np.abs(outs["chunk_outer"][2]).max() > 0, "shading grads inactive"
    for name, a, b in zip(names, outs["inverted"], outs["chunk_outer"]):
        if name == "d_lut":
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize("combined", [False, True])
def test_inverted_fused_coloring_matches_chunk_outer(cam, combined):
    """Fused d_imp (+ d_grad when combined) == the two-pass chunk-outer
    coloring backward on a >= INVERT_MIN_CHUNKS render."""
    res = 96
    sc = Scene.synthetic("sphere", side=64)
    imp = jnp.asarray((np.asarray(sc.volume) > 0.3).astype(np.float32) * 0.8)
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(sc.volume, major)
    imp_perm = slab.permute_volume(imp, major)
    grad_perm = (
        slab.permute_gradient(slab.gradient_volume(sc.volume), major)
        if combined
        else None
    )
    p = PARAMS.replace(use_importance_coloring=True, use_shading=combined)
    feats, miss, r = slab_kernel._chunked_feats(
        m, res, res, vol_perm.shape[0], major, sign, layout
    )
    assert feats.shape[0] >= slab_kernel.INVERT_MIN_CHUNKS
    wvec = jnp.sin(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.11
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)

    outs = {}
    orig = slab_kernel.INVERT_MIN_CHUNKS
    for label, floor in (("inverted", orig), ("chunk_outer", 10**9)):
        slab_kernel.INVERT_MIN_CHUNKS = floor
        try:
            with emulate(slab_kernel, slab_bwd_kernel):
                out = slab_kernel._forward_call(
                    p, sign, vol_perm, sc.tf_lut, feats, imp_perm=imp_perm,
                    grad_perm=grad_perm,
                )
                grads = slab_bwd_kernel.backward_coloring(
                    p, major, sign, vol_perm, imp_perm, feats, out, wvec,
                    grad_perm=grad_perm,
                )
            outs[label] = tuple(np.asarray(x) for x in (out,) + tuple(grads))
        finally:
            slab_kernel.INVERT_MIN_CHUNKS = orig

    names = ("out", "d_imp", "d_grad", "d_feats") if combined else (
        "out", "d_imp", "d_feats"
    )
    assert np.abs(outs["chunk_outer"][1]).max() > 0, "d_imp inactive"
    for name, a, b in zip(names, outs["inverted"], outs["chunk_outer"]):
        np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize("orbit", [(210.0, 20.0), (120.0, 10.0), (30.0, 80.0)])
def test_forward_other_majors_and_signs(scene, orbit):
    """Forward vs the jnp golden for cameras whose dominant axis / march
    sign differ from the module fixture (major 2 sign -1): (210,20) is
    major 2 sign +1, (120,10) major 0, (30,80) major 1 — exercises the
    sign-flip branches of the batched meta and the axis layouts."""
    h, v = orbit
    m = Camera(aspect=1.0, distance=1.2).orbit(h, v, 0.0).matrices()
    got = _emu_forward(scene, m, PARAMS, RES, RES)
    want = np.asarray(slab.render(scene, m, PARAMS, RES, RES))
    assert want[..., 3].max() > 0.1
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_backward_positive_sign_matches_autodiff(scene):
    """Two-pass/fused backward at march sign +1 (the fixture covers -1)."""
    from volym_tpu.render import rays as rays_mod

    m = Camera(aspect=1.0, distance=1.2).orbit(210.0, 20.0, 0.0).matrices()
    major, sign = slab.dominant_axis(m)
    assert sign > 0
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.cos(
        jnp.arange(4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32) * 0.1
    ).reshape(1, 4, slab_kernel.RAYS_PER_CHUNK)
    with emulate(slab_kernel, slab_bwd_kernel):
        out = slab_kernel._forward_call(
            PARAMS, sign, vol_perm, scene.tf_lut, feats
        )
        d_vol, d_lut, d_feats = slab_bwd_kernel.backward(
            PARAMS, major, sign, vol_perm, scene.tf_lut, feats, out, wvec
        )

    order = slab_kernel._tile_order(RES, RES)
    w_rays = np.asarray(wvec).transpose(0, 2, 1).reshape(-1, 4)[: RES * RES]
    w_img = w_rays[np.argsort(order)] if order is not None else w_rays
    origin, dirs = rays_mod.generate_rays(m, RES, RES)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss(vp, lut):
        img = slab.march_slabs(
            vp, slab.permute_volume(scene.importance, major), lut, origin,
            dirs, entry, exit_, major, sign, PARAMS,
        )
        return jnp.sum(img * jnp.asarray(w_img))

    ga_vol, ga_lut = jax.grad(loss, argnums=(0, 1))(vol_perm, scene.tf_lut)
    for name, a, b in (("d_vol", ga_vol, d_vol), ("d_lut", ga_lut, d_lut)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        assert scale > 1e-5, name
        np.testing.assert_allclose(
            b, a, atol=3e-3 * scale, rtol=2e-2, err_msg=name
        )


@pytest.mark.parametrize("mode", ["base", "shaded", "coloring"])
def test_colwin_matches_full(cam, mode):
    """The column-windowed contraction (per-step 128-aligned lane window
    with a precomputed fits bit; straddling steps fall back to the full
    width) must reproduce the full-width kernels exactly: forward, fused
    backward (inverted grid), and camera cotangents.  WIN_COLS is patched
    to 32 so a side-64 scene at 96x96 genuinely mixes both branches."""
    res = 96
    sc = Scene.synthetic("sphere", side=64)
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(sc.volume, major)
    imp_perm = grad_perm = None
    if mode == "coloring":
        imp = jnp.asarray((np.asarray(sc.volume) > 0.3).astype(np.float32) * 0.8)
        imp_perm = slab.permute_volume(imp, major)
    if mode == "shaded":
        grad_perm = slab.permute_gradient(slab.gradient_volume(sc.volume), major)
    p = PARAMS.replace(
        use_shading=mode == "shaded", use_importance_coloring=mode == "coloring"
    )
    feats, miss, r = slab_kernel._chunked_feats(
        m, res, res, vol_perm.shape[0], major, sign, layout
    )
    assert feats.shape[0] >= slab_kernel.INVERT_MIN_CHUNKS
    win_rows = slab_kernel.window_rows(m, res, res, vol_perm.shape[0], major, sign)
    wvec = jnp.sin(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.07
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)

    # the patched WIN_COLS must genuinely mix fits / straddling batches
    sb = slab_kernel.SLAB_BATCH
    meta = slab_kernel.build_step_meta(
        feats, None, n_slabs=vol_perm.shape[0], sb=sb, sign=sign,
        nr=vol_perm.shape[1], nc=vol_perm.shape[2], margin=1.0,
        win_rows=0, win_cols=32,
    )
    fits = np.asarray(meta[:, :, 0, 1])  # per-batch [c0, fits] rows
    assert 0 < fits.sum() < fits.size, "WIN_COLS=32 must mix both branches"

    def run():
        with emulate(slab_kernel, slab_bwd_kernel):
            out = slab_kernel._forward_call(
                p, sign, vol_perm, sc.tf_lut, feats, imp_perm=imp_perm,
                grad_perm=grad_perm, win_rows=win_rows,
            )
            if mode == "base":
                grads = slab_bwd_kernel.backward(
                    p, major, sign, vol_perm, sc.tf_lut, feats, out, wvec,
                    win_rows=win_rows,
                )
            elif mode == "shaded":
                grads = slab_bwd_kernel.backward_shaded(
                    p, major, sign, vol_perm, grad_perm, sc.tf_lut, feats,
                    out, wvec, win_rows=win_rows,
                )
            else:
                grads = slab_bwd_kernel.backward_coloring(
                    p, major, sign, vol_perm, imp_perm, feats, out, wvec,
                    win_rows=win_rows,
                )
        return tuple(np.asarray(x) for x in (out,) + tuple(grads))

    orig = slab_kernel.WIN_COLS
    orig_bwd = slab_bwd_kernel.BWD_WIN_COLS
    try:
        slab_kernel.WIN_COLS = 32
        slab_bwd_kernel.BWD_WIN_COLS = 1  # opt-in: off by default (perf)
        with_colwin = run()
        slab_kernel.WIN_COLS = 10**9  # window_cols() -> 0: colwin off
        slab_bwd_kernel.BWD_WIN_COLS = 0
        without = run()
    finally:
        slab_kernel.WIN_COLS = orig
        slab_bwd_kernel.BWD_WIN_COLS = orig_bwd

    assert np.abs(without[1]).max() > 0, "gradients inactive"
    names = ("out", "g0", "g1", "g2", "g3")
    for name, a, b in zip(names, with_colwin, without):
        np.testing.assert_array_equal(a, b, err_msg=f"{mode}:{name}")


def test_forward_step_size_planes_matches_golden(scene, cam):
    """Step-size mapping (slab-axis resample): the kernel marching a
    supersampled (2N) and a subsampled (N/2) grid must match the jnp
    golden driven with the SAME raymarching_step_size — both entries map
    the knob through slab.resolve_planes, so the production path's
    step-size rows are real (VERDICT r3 item 3)."""
    m = cam.matrices()
    n = scene.volume.shape[0]
    for step, want_planes, smooth in (
        (0.03, 2 * n, False),
        (0.1, n // 2, False),
        (0.1, n // 2, True),  # smoothing on a subsampled grid (in-plane
                              # bounds must use the slice texel resolution)
    ):
        p = PARAMS.replace(raymarching_step_size=step, use_gaussian_smoothing=smooth)
        assert slab.resolve_planes(p, n) == want_planes
        major, sign = slab.dominant_axis(m)
        layout = slab._AXIS_LAYOUT[major]
        vol_perm = slab.slab_resample(
            slab.permute_volume(scene.volume, major), want_planes
        )
        feats, miss, r = slab_kernel._chunked_feats(
            m, RES, RES, want_planes, major, sign, layout, n_plane=n
        )
        with emulate(slab_kernel):
            out = slab_kernel._forward_call(
                p, sign, vol_perm, scene.tf_lut, feats
            )
        got = np.asarray(slab_kernel._assemble(out, miss, r, RES, RES))
        want = np.asarray(slab.render(scene, m, p, RES, RES))
        assert want[..., 3].max() > 0.1
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_backward_inverted_fused_multichunk(cam):
    """The inverted (slab-outer) + fused-scatter backward path needs >= 8
    ray chunks, which the single-tile tests never reach — cover it in the
    emulator at 96² (9 chunks) against plain autodiff of the jnp replay.

    Tolerance is outlier-COUNT based: a handful of isolated voxels may
    differ by whole-step amounts where a ~2^-18 kernel-vs-golden density
    difference puts the two forwards on opposite sides of the threshold
    kink (each backward is then exactly consistent with its own branch —
    verified by per-branch finite differences).  A real fused-path
    regression (e.g. double accumulation) is systematic across a slab and
    blows the count."""
    import jax

    from volym_tpu.render import rays as rays_mod

    scene = Scene.synthetic("sphere", side=16)
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    H = W = 96
    feats, miss, r = slab_kernel._chunked_feats(m, H, W, 16, major, sign, layout)
    assert feats.shape[0] >= slab_kernel.INVERT_MIN_CHUNKS  # inverted+fused

    w = jnp.cos(jnp.arange(H * W * 4, dtype=jnp.float32).reshape(-1, 4) * 0.1)
    wq = slab_kernel._chunk_rays(w.T, H, W)
    with emulate(slab_kernel, slab_bwd_kernel):
        fin = slab_kernel._forward_call(PARAMS, sign, vol_perm, scene.tf_lut, feats)
        d_vol, d_lut, d_feats = slab_bwd_kernel.backward(
            PARAMS, major, sign, vol_perm, scene.tf_lut, feats, fin, wq,
            win_rows=0,
        )

    origin, dirs = rays_mod.generate_rays(m, H, W)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)

    def loss_jnp(vp, lut):
        img = slab.march_slabs_diff(
            PARAMS, major, sign, vp,
            slab.permute_volume(scene.importance, major), lut,
            origin, dirs, entry, exit_,
        )
        return jnp.sum(img * w)

    gv, gl = jax.grad(loss_jnp, argnums=(0, 1))(vol_perm, scene.tf_lut)
    for name, a, b in (("d_volume", gv, d_vol), ("d_lut", gl, d_lut)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - b) / scale
        n_out = int((rel > 1e-2).sum())
        assert n_out <= 8, (
            f"inverted+fused {name}: {n_out} outliers > 1e-2 rel "
            f"(max {rel.max():.2e}) — systematic, not knife-edge"
        )


def test_chunk_grouping_matches_single_call(scene, cam):
    """Large images run as sequential chunk-group pallas calls
    (CHUNK_GROUP); the grouped forward/backward must equal the single-call
    results exactly (the groups see disjoint chunks; scatter grids and
    d_lut sum, d_feats concatenate)."""
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    H = W = 64  # 4 chunks
    feats, miss, r = slab_kernel._chunked_feats(m, H, W, 16, major, sign, layout)
    w = jnp.cos(jnp.arange(H * W * 4, dtype=jnp.float32).reshape(-1, 4) * 0.1)
    wq = slab_kernel._chunk_rays(w.T, H, W)

    def run():
        with emulate(slab_kernel, slab_bwd_kernel):
            fin = slab_kernel._forward_call(
                PARAMS, sign, vol_perm, scene.tf_lut, feats
            )
            grads = slab_bwd_kernel.backward(
                PARAMS, major, sign, vol_perm, scene.tf_lut, feats, fin, wq,
                win_rows=0,
            )
        return fin, grads

    fin1, g1 = run()
    prev = slab_kernel.CHUNK_GROUP
    slab_kernel.CHUNK_GROUP = 2  # force 2 groups
    try:
        fin2, g2 = run()
    finally:
        slab_kernel.CHUNK_GROUP = prev
    np.testing.assert_allclose(np.asarray(fin2), np.asarray(fin1), atol=0)
    for name, a, b in zip(("d_volume", "d_lut", "d_feats"), g1, g2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-6, err_msg=name
        )


@pytest.mark.parametrize("smoothing", [False, True])
def test_stored_density_backward_bitwise(scene, cam, smoothing):
    """The stored-density replay (forward emits per-step density, backward
    loads it instead of re-contracting the volume slice) must be BITWISE
    equal to the recomputing replay — the stored value is the same
    kernel_dot over the same operands, just persisted (under Gaussian
    smoothing: the same stencil over the same rows, letting the replay
    skip the whole prologue).  Also pins the emit_density forward
    contract: the rgba output is unchanged and skipped steps publish
    exactly-zero density."""
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    wvec = jnp.sin(
        jnp.arange(
            feats.shape[0] * 4 * slab_kernel.RAYS_PER_CHUNK, dtype=jnp.float32
        )
        * 0.07
    ).reshape(feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK)
    params = PARAMS.replace(
        camera_grads=False, use_gaussian_smoothing=smoothing
    )

    with emulate(slab_kernel, slab_bwd_kernel):
        out_plain = slab_kernel._forward_call(
            params, sign, vol_perm, scene.tf_lut, feats
        )
        out, dens = slab_kernel._forward_call(
            params, sign, vol_perm, scene.tf_lut, feats, emit_density=True
        )
        d_vol_s, d_lut_s, d_feats_s = slab_bwd_kernel.backward(
            params, major, sign, vol_perm, scene.tf_lut, feats, out, wvec,
            dens=dens,
        )
        d_vol_r, d_lut_r, d_feats_r = slab_bwd_kernel.backward(
            params, major, sign, vol_perm, scene.tf_lut, feats, out, wvec,
        )

    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_plain))
    for name, a, b in (
        ("d_vol", d_vol_s, d_vol_r),
        ("d_lut", d_lut_s, d_lut_r),
        ("d_feats", d_feats_s, d_feats_r),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"{name}: stored != recomputed"
        )
    # density is sane: in [0, 1] (the volume is), and nonzero somewhere
    dn = np.asarray(dens)
    assert dn.min() >= 0.0 and dn.max() <= 1.0 + 1e-6
    assert np.abs(dn).max() > 0


def test_stored_density_render_diff_matches_golden(scene, cam):
    """End-to-end render_diff gradcheck with the stored-density default ON
    vs plain autodiff of the jnp golden (camera_grads=False path)."""
    if not slab_kernel.STORE_DENSITY:
        pytest.skip("VOLYM_STORE_DENSITY=0")
    m = cam.matrices()
    params = PARAMS.replace(camera_grads=False)

    def loss_k(vol, lut):
        img = slab_kernel._render_pallas_diff_jit.__wrapped__(
            Scene(vol, scene.importance, lut), m, params.pallas_static(),
            RES, RES, *slab.dominant_axis(m), knobs=params.knobs(),
        )
        return jnp.sum(img ** 2)

    def loss_g(vol, lut):
        img = slab.render_diff(
            Scene(vol, scene.importance, lut), m, params, RES, RES
        )
        return jnp.sum(img ** 2)

    with emulate(slab_kernel, slab_bwd_kernel):
        lk, gk = jax.value_and_grad(loss_k, argnums=(0, 1))(
            scene.volume, scene.tf_lut
        )
    lg, gg = jax.value_and_grad(loss_g, argnums=(0, 1))(
        scene.volume, scene.tf_lut
    )
    np.testing.assert_allclose(float(lk), float(lg), rtol=1e-4)
    for name, a, b in (("d_vol", gk[0], gg[0]), ("d_lut", gk[1], gg[1])):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, atol=3e-3 * scale, rtol=2e-2, err_msg=name
        )


@pytest.mark.parametrize("cone", [False, True])
def test_lookahead_fractional_importance(scene, cam, cone):
    """The pre-pass's combined gate bit distinguishes the PROBE threshold
    (importance >= 0.5 counts as important-ahead) from the CURRENT-step
    opacity compare (importance < 1.0 still skips): a band with
    importance 0.8 must trigger the skip for samples in front of it AND
    itself be skippable — the ternary slice encoding covers both with one
    stream.  Kernel (emulator) vs the jnp slab golden."""
    import volym_tpu.render.slab as slab_m
    from volym_tpu.ops import lookahead_kernel

    vol = np.asarray(scene.volume).copy()
    imp = np.zeros_like(vol)
    vol[:, 6:10, 6:10] = 0.6        # a dense column so skipping matters
    imp[8:12, 6:10, 6:10] = 0.8     # important-ish but NOT opaque
    imp[12:14, 8:9, 8:9] = 1.0      # a truly opaque core
    s = Scene(
        volume=jnp.asarray(vol),
        importance=jnp.asarray(imp),
        tf_lut=scene.tf_lut,
    )
    m = cam.matrices()
    params = PARAMS.replace(
        use_importance_rendering=True, use_cone_importance_check=cone,
        density_threshold=0.05,
    )

    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(s.volume, major)
    imp_perm = slab.permute_volume(s.importance, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, RES, RES, vol_perm.shape[0], major, sign, layout
    )
    cone_feats = (
        slab_kernel._chunk_rays(
            slab_kernel._pack_cone_features(
                m, RES, RES, vol_perm.shape[0], major, sign, layout
            ),
            RES, RES,
        )
        if cone
        else None
    )
    with emulate(slab_kernel, lookahead_kernel):
        ahead = lookahead_kernel.lookahead_call(
            sign, imp_perm, feats, cone_feats, subtexel=params.subtexel_bits
        )
        out = slab_kernel._forward_call(
            params, sign, vol_perm, s.tf_lut, feats, imp_perm=imp_perm,
            ahead=ahead,
        )
    img_k = np.asarray(slab_kernel._assemble(out, miss, r, RES, RES))
    img_g = np.asarray(slab.render(s, m, params, RES, RES))
    np.testing.assert_allclose(img_k, img_g, atol=2e-5)
    # the gate must actually fire somewhere (otherwise this test is vacuous):
    # compare against the same render with look-ahead off
    img_off = np.asarray(
        slab.render(s, m, params.replace(use_importance_rendering=False),
                    RES, RES)
    )
    assert np.abs(img_g - img_off).max() > 1e-3


def test_cone_window_matches_full(scene, cam):
    """CONE_WIN_ROWS (default off — measured negative at 256³, see
    lookahead_kernel) must stay bit-exact vs the full-width pre-pass."""
    from volym_tpu.ops import lookahead_kernel

    imp = np.zeros((16, 16, 16), np.float32)
    imp[10:13, 4:9, 4:9] = 1.0
    m = cam.matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    imp_perm = slab.permute_volume(jnp.asarray(imp), major)
    feats, miss, r = slab_kernel._chunked_feats(m, RES, RES, 16, major, sign, layout)
    cone_feats = slab_kernel._chunk_rays(
        slab_kernel._pack_cone_features(m, RES, RES, 16, major, sign, layout),
        RES, RES,
    )
    prev = lookahead_kernel.CONE_WIN_ROWS
    try:
        with emulate(slab_kernel, lookahead_kernel):
            lookahead_kernel.CONE_WIN_ROWS = 0
            full = lookahead_kernel.lookahead_call(
                sign, imp_perm, feats, cone_feats, subtexel=8
            )
            lookahead_kernel.CONE_WIN_ROWS = 8
            win = lookahead_kernel.lookahead_call(
                sign, imp_perm, feats, cone_feats, subtexel=8
            )
    finally:
        lookahead_kernel.CONE_WIN_ROWS = prev
    assert np.abs(np.asarray(full)).max() > 0  # the gate fires somewhere
    np.testing.assert_array_equal(np.asarray(win), np.asarray(full))


def test_smoothing_backward_subsampled_planes(scene, cam):
    """Gaussian-smoothed BACKWARD under the step-size plane mapping
    (planes != nr): the stencil transpose must bound in-plane tap coords
    with nr/nc, not the plane count (regression: bounding with n_slabs
    masked most taps out whenever planes < nr, corrupting d_volume while
    d_lut stayed correct)."""
    m = cam.matrices()
    # 16^3 scene; step 0.1 -> 8 planes < nr=16 (STEP_LADDER 0.5 bucket)
    params = PARAMS.replace(
        use_gaussian_smoothing=True, raymarching_step_size=0.1,
        camera_grads=False,
    )
    assert slab.resolve_planes(params, 16) < 16

    def loss_k(vol, lut):
        img = slab_kernel._render_pallas_diff_jit.__wrapped__(
            Scene(vol, scene.importance, lut), m, params.pallas_static(),
            RES, RES, *slab.dominant_axis(m), knobs=params.knobs(),
            planes=slab.resolve_planes(params, 16),
        )
        return jnp.sum(img ** 2)

    def loss_g(vol, lut):
        img = slab.render_diff(
            Scene(vol, scene.importance, lut), m, params, RES, RES
        )
        return jnp.sum(img ** 2)

    with emulate(slab_kernel, slab_bwd_kernel):
        lk, gk = jax.value_and_grad(loss_k, argnums=(0, 1))(
            scene.volume, scene.tf_lut
        )
    lg, gg = jax.value_and_grad(loss_g, argnums=(0, 1))(
        scene.volume, scene.tf_lut
    )
    np.testing.assert_allclose(float(lk), float(lg), rtol=1e-4)
    for name, a, b in (("d_vol", gk[0], gg[0]), ("d_lut", gk[1], gg[1])):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, atol=3e-3 * scale, rtol=2e-2, err_msg=name
        )
    assert np.abs(np.asarray(gg[0])).max() > 0


def test_cone_nonmultiple8_columns():
    """nc % 8 != 0: the packed cone bit planes pad columns to a word
    multiple — clipped sampler coords never select the padded tail, so
    the gate stays exact (regression for the r5 packed-plane rewrite)."""
    side = 20
    vol = np.full((side,) * 3, 0.45, np.float32)
    imp = np.zeros((side,) * 3, np.float32)
    vol[12:16, 5:15, 5:15] = 0.9
    imp[12:16, 5:15, 5:15] = 1.0
    from volym_tpu.scene import Scene as S

    sc = S(
        volume=jnp.asarray(vol),
        importance=jnp.asarray(imp),
        tf_lut=Scene.synthetic("sphere", side=8).tf_lut,
    )
    m = Camera(aspect=1.0, distance=1.3).orbit(10.0, 5.0, 0.0).matrices()
    p = PARAMS.replace(
        use_importance_rendering=True,
        use_cone_importance_check=True,
        raymarching_step_size=1.0 / side,
    )
    got = _emu_lookahead_forward(sc, m, p)
    want = np.asarray(slab.render(sc, m, p, RES, RES))
    err = np.abs(got - want).max(-1)
    assert (err > 1e-3).mean() <= 0.01, f"max err {err.max()}"


def test_smoothed_padded_lanes_stay_finite(scene, cam):
    """A ray count that does not fill the last chunk zero-pads the feats;
    the smoothing stencil's delta/ts must not divide by the padded lanes'
    ts == 0 (latent NaN found in r5: it survived the masks via NaN*0 and
    poisoned the stored density and voxel scatter)."""
    m = cam.matrices()
    p = PARAMS.replace(use_gaussian_smoothing=True, camera_grads=False)
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(scene.volume, major)
    # 40x40 = 1600 rays -> pads to the next RAYS_PER_CHUNK multiple
    feats, miss, r = slab_kernel._chunked_feats(
        m, 40, 40, vol_perm.shape[0], major, sign, layout
    )
    assert feats.shape[0] * slab_kernel.RAYS_PER_CHUNK > r  # padding active
    wvec = jnp.ones(
        (feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK), jnp.float32
    )
    with emulate(slab_kernel, slab_bwd_kernel):
        out, dens = slab_kernel._forward_call(
            p, sign, vol_perm, scene.tf_lut, feats, emit_density=True
        )
        dv, dl, df = slab_bwd_kernel.backward(
            p, major, sign, vol_perm, scene.tf_lut, feats, out, wvec,
            dens=dens,
        )
    for name, x in (("out", out), ("dens", dens), ("d_vol", dv), ("d_lut", dl)):
        assert bool(jnp.isfinite(jnp.asarray(x)).all()), f"{name} non-finite"
