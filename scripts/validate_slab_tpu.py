"""Hardware validation of the Pallas slab kernels (forward + backward).

Run on a real TPU (Pallas interpret mode is too slow; CI covers the kernel
*bodies* via tests/pallas_emu.py — this script covers Mosaic lowering):

    python scripts/validate_slab_tpu.py

Checks, against the gather-based jnp slab golden (render/slab.py):
  * forward allclose over all three major axes / both signs, both
    interpolation filters, and the shading / importance-coloring branches;
  * the windowed y-contraction (static per-camera window, 64^3 at 128^2)
    against both the unwindowed kernel and the golden;
  * fast_math (DEFAULT-precision) forward within its documented bound;
  * voxel/LUT gradients of the two-pass Pallas backward (windowed and
    full) vs the jnp replay VJP.
Exit code 0 on success.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel
from volym_tpu.render import slab


def main() -> int:
    if jax.devices()[0].platform != "tpu":
        print("WARNING: not on TPU; this will be slow/interpreted")
    scene = Scene.synthetic("sphere", side=32)
    params = RenderParams(
        use_gaussian_smoothing=False,
        use_shading=False,
        interpolation="trilinear",
        raymarching_step_size=0.02,
    )
    failures = []

    def check_fwd(tag, scn, m, p, res, tol=1e-3, frac=0.0):
        # ``frac`` pixels may exceed tol: early-termination knife-edges
        # (acc_a within float eps of 0.95) legitimately flip between any
        # two float implementations of the same march
        g = np.asarray(slab.render(scn, m, p, res, res))
        k = np.asarray(slab_kernel.render(scn, m, p, res, res))
        err = np.abs(g - k).max(-1)
        bad = (err > tol).mean()
        print(f"{tag}: maxerr {err.max():.2e} frac>{tol:g} {bad:.2e}")
        if bad > frac or not np.isfinite(k).all():
            failures.append(tag)

    for h, v in [(0.0, 0.0), (30.0, 20.0), (80.0, -40.0), (200.0, 10.0), (45.0, 45.0)]:
        m = Camera(aspect=1.0, distance=1.2).orbit(h, v, 0.0).matrices()
        for p in (params, params.replace(interpolation="nearest")):
            tag = f"fwd cam({h},{v}) {p.interpolation.value} major={slab.dominant_axis(m)}"
            check_fwd(tag, scene, m, p, 32)

    # mode branches
    m = Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()
    check_fwd("fwd shading", scene, m, params.replace(use_shading=True), 32)
    check_fwd(
        "fwd coloring", scene, m, params.replace(use_importance_coloring=True), 32
    )
    # fast_math: documented preview-mode bound (threshold-boundary flips)
    check_fwd("fwd fast_math", scene, m, params.replace(fast_math=True), 32, tol=0.5)
    check_fwd(
        "fwd first-hit", scene, m, params.replace(use_opacity=False), 32
    )
    check_fwd(
        "fwd first-hit shaded", scene, m,
        params.replace(use_opacity=False, use_shading=True), 32,
    )
    check_fwd(
        "fwd coloring+shading", scene, m,
        params.replace(use_importance_coloring=True, use_shading=True), 32,
    )

    # Gaussian smoothing (slab-axis stencil) vs the jnp slab golden
    for interp in ("trilinear", "nearest"):
        p = params.replace(use_gaussian_smoothing=True, interpolation=interp)
        check_fwd(f"fwd gaussian {interp}", scene, m, p, 32)
    check_fwd(
        "fwd gaussian+shading", scene, m,
        params.replace(use_gaussian_smoothing=True, use_shading=True), 32,
    )
    # Large-N smoothing: the stencil's tap offsets scale with the slab
    # count (|u| <= 0.01*N), so only a 256^3 grid exercises the +-2/+-3
    # halo rows (prev/next-block reads) at all — THE regression check for
    # the smoothing batch layout
    big256 = Scene.synthetic("sphere", side=256)
    m256 = Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()
    check_fwd(
        "fwd gaussian 256^3 (halo rows)", big256, m256,
        params.replace(use_gaussian_smoothing=True), 64, frac=2e-3,
    )
    check_fwd(
        "fwd gaussian+shading 256^3", big256, m256,
        params.replace(use_gaussian_smoothing=True, use_shading=True), 64,
        frac=2e-3,
    )
    # smoothed+shaded BACKWARD at full 256^3/256^2 scale: compile smoke.
    # The scatter_shaded voxel-grad kernel's output blocks exceed Mosaic's
    # 16 MB default scoped-vmem limit at this scale (fixed by
    # vmem_params(True)); the small-scene gradient checks below never
    # reach that regime, so compile+run it once here.
    try:
        p_big = params.replace(
            use_gaussian_smoothing=True, use_shading=True, camera_grads=False
        )

        def _big_loss(vol):
            img = slab_kernel.render_diff(
                Scene(vol, big256.importance, big256.tf_lut), m256, p_big,
                256, 256,
            )
            return jnp.sum(img)

        gv = jax.jit(jax.grad(_big_loss))(big256.volume)
        jax.block_until_ready(gv)
        print("bwd gaussian+shading 256^3/256^2: compiled and ran")
    except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
        print(f"bwd gaussian+shading 256^3/256^2 FAILED: {e}")
        failures.append("bwd gaussian+shading 256^3 compile")
    # smoothing + look-ahead combined runs
    # importance-driven look-ahead (straight + cone) vs the jnp slab golden
    import jax.numpy as jnp2

    side = 32
    vol = np.full((side, side, side), 0.45, np.float32)
    imp = np.zeros((side, side, side), np.float32)
    vol[20:26, 8:24, 8:24] = 0.9
    imp[20:26, 8:24, 8:24] = 1.0
    la_scene = Scene(
        volume=jnp2.asarray(vol), importance=jnp2.asarray(imp),
        tf_lut=scene.tf_lut,
    )
    m_la = Camera(aspect=1.0, distance=1.3).orbit(10.0, 5.0, 0.0).matrices()
    for cone in (False, True):
        p = params.replace(
            use_importance_rendering=True, use_cone_importance_check=cone
        )
        tag = f"fwd lookahead cone={cone}"
        base = np.asarray(slab.render(la_scene, m_la, params, 32, 32))
        want = np.asarray(slab.render(la_scene, m_la, p, 32, 32))
        if np.abs(want - base).max() < 0.05:
            failures.append(tag + " (not engaged)")
        check_fwd(tag, la_scene, m_la, p, 32, frac=0.01)

    # windowed contraction: 64^3 at 128^2 gives a real (sub-slice) window at
    # d=1.2; d=2.0 degenerates to full slices but exercises 16-tile reorder
    big = Scene.synthetic("sphere", side=64)
    for dist in (1.2, 2.0):
        mw = Camera(aspect=1.0, distance=dist).orbit(30.0, 20.0, 0.0).matrices()
        major, sign = slab.dominant_axis(mw)
        win = slab_kernel.window_rows(mw, 128, 128, 64, major, sign)
        print(f"windowed d={dist}: window_rows={win}")
        g = np.asarray(slab.render(big, mw, params, 128, 128))
        k = np.asarray(slab_kernel.render(big, mw, params, 128, 128))  # auto window
        kf = np.asarray(
            slab_kernel._render_pallas_jit(big, mw, params, 128, 128, major, sign, 0)
        )
        err_g = (np.abs(k - g).max(-1) > 1e-3).mean()
        err_f = np.abs(k - kf).max()
        print(f"windowed d={dist}: frac vs golden {err_g:.2e}, vs full kernel {err_f:.2e}")
        if err_g > 2e-4 or err_f > 1e-5:
            failures.append(f"windowed d={dist}")

    # gradients (render_diff auto-selects the window; also check full)
    w = jnp.cos(jnp.arange(32 * 32 * 4, dtype=jnp.float32).reshape(32, 32, 4) * 0.1)
    m = Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()

    def loss(render_fn, vol, lut):
        img = render_fn(Scene(vol, scene.importance, lut), m, params, 32, 32)
        return jnp.sum(img * w)

    ga = jax.grad(lambda v, l: loss(slab.render_diff, v, l), argnums=(0, 1))(
        scene.volume, scene.tf_lut
    )
    gp = jax.grad(lambda v, l: loss(slab_kernel.render_diff, v, l), argnums=(0, 1))(
        scene.volume, scene.tf_lut
    )
    for name, a, b in zip(("d_volume", "d_lut"), ga, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - b).max() / scale
        print(f"bwd {name}: relerr {rel:.2e}")
        if rel > 1e-2 or not np.isfinite(b).all():
            failures.append(f"bwd {name}")

    # shaded-mode gradients: Blinn-Phong chain (volume via the gradient
    # field, LUT, camera half vectors) vs the jnp replay VJP
    p_sh = params.replace(use_shading=True)

    def loss_sh(render_fn, vol, lut):
        img = render_fn(Scene(vol, scene.importance, lut), m, p_sh, 32, 32)
        return jnp.sum(img * w)

    ga_sh = jax.grad(lambda v, l: loss_sh(slab.render_diff, v, l), argnums=(0, 1))(
        scene.volume, scene.tf_lut
    )
    gp_sh = jax.grad(
        lambda v, l: loss_sh(slab_kernel.render_diff, v, l), argnums=(0, 1)
    )(scene.volume, scene.tf_lut)
    for name, a, b in zip(("d_volume", "d_lut"), ga_sh, gp_sh):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - b).max() / scale
        print(f"bwd shaded {name}: relerr {rel:.2e}")
        if rel > 1e-2 or not np.isfinite(b).all():
            failures.append(f"bwd shaded {name}")

    # coloring-mode gradients: d_importance vs the jnp replay VJP
    p_col = params.replace(use_importance_coloring=True)
    imp_field = jnp2.asarray((np.asarray(scene.volume) > 0.3) * 0.8, jnp2.float32)
    col_scene = Scene(volume=scene.volume, importance=imp_field, tf_lut=scene.tf_lut)

    def loss_col(render_fn, imp):
        img = render_fn(
            Scene(scene.volume, imp, scene.tf_lut), m, p_col, 32, 32
        )
        return jnp.sum(img * w)

    gi_jnp = jax.grad(lambda i: loss_col(slab.render_diff, i))(imp_field)
    gi_pal = jax.grad(lambda i: loss_col(slab_kernel.render_diff, i))(imp_field)
    a, bb = np.asarray(gi_jnp), np.asarray(gi_pal)
    scale = max(np.abs(a).max(), 1e-9)
    rel = np.abs(a - bb).max() / scale
    print(f"bwd coloring d_importance: relerr {rel:.2e} (scale {scale:.2e})")
    if rel > 1e-2 or not np.isfinite(bb).all():
        failures.append("bwd coloring d_importance")

    # coloring + shading combined: d_importance AND d_volume (through the
    # gradient-field chain) vs the jnp replay VJP
    p_colsh = params.replace(use_importance_coloring=True, use_shading=True)

    def loss_colsh(render_fn, imp, vol):
        img = render_fn(
            Scene(vol, imp, scene.tf_lut), m, p_colsh, 32, 32
        )
        return jnp.sum(img * w)

    for argi, name in ((0, "d_importance"), (1, "d_volume")):
        gj = jax.grad(
            lambda i, v: loss_colsh(slab.render_diff, i, v), argnums=argi
        )(imp_field, scene.volume)
        gp = jax.grad(
            lambda i, v: loss_colsh(slab_kernel.render_diff, i, v), argnums=argi
        )(imp_field, scene.volume)
        a, bb = np.asarray(gj), np.asarray(gp)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - bb).max() / scale
        print(f"bwd coloring+shading {name}: relerr {rel:.2e} (scale {scale:.2e})")
        if rel > 1e-2 or not np.isfinite(bb).all():
            failures.append(f"bwd coloring+shading {name}")

    # Gaussian-smoothed gradients: replay + stencil transpose + pass 2b
    # (rows/cols chain) vs the jnp replay VJP
    p_sm = params.replace(use_gaussian_smoothing=True, use_shading=False)

    def loss_sm(render_fn, vol, lut):
        img = render_fn(Scene(vol, scene.importance, lut), m, p_sm, 32, 32)
        return jnp.sum(img * w)

    ga_sm = jax.grad(lambda v, l: loss_sm(slab.render_diff, v, l), argnums=(0, 1))(
        scene.volume, scene.tf_lut
    )
    gp_sm = jax.grad(
        lambda v, l: loss_sm(slab_kernel.render_diff, v, l), argnums=(0, 1)
    )(scene.volume, scene.tf_lut)
    for name, a, b in zip(("d_volume", "d_lut"), ga_sm, gp_sm):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - b).max() / scale
        print(f"bwd smoothed {name}: relerr {rel:.2e}")
        if rel > 1e-2 or not np.isfinite(b).all():
            failures.append(f"bwd smoothed {name}")

    # smoothed backward under the step-size plane mapping (planes < nr):
    # exercises the stencil transpose's nr/nc tap bounds on hardware
    # (the bug class test_smoothing_backward_subsampled_planes pins in CI)
    p_smsub = params.replace(
        use_gaussian_smoothing=True, use_shading=False,
        raymarching_step_size=2.0 / scene.volume.shape[0],
    )
    from volym_tpu.render.slab import resolve_planes

    assert resolve_planes(p_smsub, scene.volume.shape[0]) < scene.volume.shape[0]

    def loss_smsub(render_fn, vol, lut):
        img = render_fn(Scene(vol, scene.importance, lut), m, p_smsub, 32, 32)
        return jnp.sum(img * w)

    ga_ss = jax.grad(lambda v, l: loss_smsub(slab.render_diff, v, l), argnums=(0, 1))(
        scene.volume, scene.tf_lut
    )
    gp_ss = jax.grad(
        lambda v, l: loss_smsub(slab_kernel.render_diff, v, l), argnums=(0, 1)
    )(scene.volume, scene.tf_lut)
    for name, a, b in zip(("d_volume", "d_lut"), ga_ss, gp_ss):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - b).max() / scale
        print(f"bwd smoothed subsampled-planes {name}: relerr {rel:.2e}")
        if rel > 1e-2 or not np.isfinite(b).all():
            failures.append(f"bwd smoothed subsampled-planes {name}")

    # smoothing + shading combined backward
    p_smsh = params.replace(use_gaussian_smoothing=True, use_shading=True)

    def loss_smsh(render_fn, vol, lut):
        img = render_fn(Scene(vol, scene.importance, lut), m, p_smsh, 32, 32)
        return jnp.sum(img * w)

    ga_x = jax.grad(
        lambda v, l: loss_smsh(slab.render_diff, v, l), argnums=(0, 1)
    )(scene.volume, scene.tf_lut)
    gp_x = jax.grad(
        lambda v, l: loss_smsh(slab_kernel.render_diff, v, l), argnums=(0, 1)
    )(scene.volume, scene.tf_lut)
    for name, a, b in zip(("d_volume", "d_lut"), ga_x, gp_x):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - b).max() / scale
        print(f"bwd smoothed+shaded {name}: relerr {rel:.2e}")
        if rel > 1e-2 or not np.isfinite(b).all():
            failures.append(f"bwd smoothed+shaded {name}")

    # smoothing + coloring: the smoothed density moves only the mask
    p_smcol = params.replace(
        use_gaussian_smoothing=True, use_importance_coloring=True
    )
    imp_f = jnp2.asarray((np.asarray(scene.volume) > 0.3) * 0.8, jnp2.float32)

    def loss_smcol(render_fn, imp_v):
        img = render_fn(
            Scene(scene.volume, imp_v, scene.tf_lut), m, p_smcol, 32, 32
        )
        return jnp.sum(img * w)

    gi_a = jax.grad(lambda i: loss_smcol(slab.render_diff, i))(imp_f)
    gi_b = jax.grad(lambda i: loss_smcol(slab_kernel.render_diff, i))(imp_f)
    a, bb = np.asarray(gi_a), np.asarray(gi_b)
    scale = max(np.abs(a).max(), 1e-9)
    rel = np.abs(a - bb).max() / scale
    print(f"bwd smoothed+coloring d_importance: relerr {rel:.2e}")
    if rel > 1e-2 or not np.isfinite(bb).all():
        failures.append("bwd smoothed+coloring d_importance")

    # look-ahead-gated gradients (straight + cone, base and shaded) vs the
    # jnp replay VJP — the gate is a zero-gradient mask, so d_volume/d_lut
    # must match under the same gating
    for cone in (False, True):
        for sh in (False, True):
            p_la = params.replace(
                use_importance_rendering=True,
                use_cone_importance_check=cone,
                use_shading=sh,
            )

            def loss_la(render_fn, vol, lut, p_la=p_la):
                img = render_fn(
                    Scene(vol, la_scene.importance, lut), m_la, p_la, 32, 32
                )
                return jnp.sum(img * w)

            ga_la = jax.grad(
                lambda v, l: loss_la(slab.render_diff, v, l), argnums=(0, 1)
            )(la_scene.volume, scene.tf_lut)
            gp_la = jax.grad(
                lambda v, l: loss_la(slab_kernel.render_diff, v, l),
                argnums=(0, 1),
            )(la_scene.volume, scene.tf_lut)
            for name, a, b in zip(("d_volume", "d_lut"), ga_la, gp_la):
                a, b = np.asarray(a), np.asarray(b)
                scale = max(np.abs(a).max(), 1e-9)
                rel = np.abs(a - b).max() / scale
                tag = f"bwd lookahead cone={cone} shaded={sh} {name}"
                print(f"{tag}: relerr {rel:.2e}")
                if rel > 1e-2 or not np.isfinite(b).all():
                    failures.append(tag)

    # camera cotangents: grads w.r.t. camera matrices through the Pallas
    # path vs the jnp replay VJP
    major, sign = slab.dominant_axis(m)
    win = slab_kernel.window_rows(m, 32, 32, 32, major, sign)

    for cam_tag, cam_p in (("", params), ("shaded ", p_sh), ("smoothed ", p_sm)):

        def loss_jnp_cam(mm, cam_p=cam_p):
            img = slab._render_diff_jit(scene, mm, cam_p, 32, 32, major, sign)
            return jnp.sum(img * w)

        def loss_pal_cam(mm, cam_p=cam_p):
            img = slab_kernel._render_pallas_diff_jit(
                scene, mm, cam_p, 32, 32, major, sign, win
            )
            return jnp.sum(img * w)

        g_jnp = jax.grad(loss_jnp_cam)(m)
        g_pal = jax.grad(loss_pal_cam)(m)
        for name, a, b in zip(
            ("view", "proj", "ivp", "pos"),
            jax.tree_util.tree_leaves(g_jnp),
            jax.tree_util.tree_leaves(g_pal),
        ):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-9)
            rel = np.abs(a - b).max() / scale
            print(f"bwd {cam_tag}camera {name}: relerr {rel:.2e} (scale {scale:.2e})")
            if scale > 1e-9 and (rel > 2e-2 or not np.isfinite(b).all()):
                failures.append(f"bwd {cam_tag}camera {name}")

    # windowed backward on the big scene at 128^2
    mw = Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()
    w128 = jnp.cos(
        jnp.arange(128 * 128 * 4, dtype=jnp.float32).reshape(128, 128, 4) * 0.1
    )

    def loss_big(vol, lut):
        img = slab_kernel.render_diff(
            Scene(vol, big.importance, lut), mw, params, 128, 128
        )
        return jnp.sum(img * w128)

    def loss_big_jnp(vol, lut):
        img = slab.render_diff(Scene(vol, big.importance, lut), mw, params, 128, 128)
        return jnp.sum(img * w128)

    gw = jax.grad(loss_big, argnums=(0, 1))(big.volume, big.tf_lut)
    gj = jax.grad(loss_big_jnp, argnums=(0, 1))(big.volume, big.tf_lut)
    for name, a, b in zip(("d_volume", "d_lut"), gj, gw):
        # Outlier-COUNT tolerance, like the forward checks' pixel
        # fraction: a handful of isolated voxels may legitimately differ
        # by whole-step amounts — threshold knife-edge rays, where a
        # ~2^-18 kernel-vs-golden density difference puts the two
        # forwards on opposite sides of the mask kink and each backward
        # is exactly consistent with its OWN branch (verified by
        # per-branch finite differences).  A real backward regression is
        # systematic (a slab or block of wrong voxels) and blows the
        # count; isolated knife edges do not.
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - b) / scale
        n_out = int((rel > 1e-2).sum())
        rel_bulk = np.quantile(rel, 1.0 - 8 / a.size) if a.size > 800 else rel.max()
        print(
            f"bwd windowed {name}: relerr max {rel.max():.2e} "
            f"outliers {n_out} bulk {rel_bulk:.2e}"
        )
        if n_out > 8 or rel_bulk > 1e-2 or not np.isfinite(b).all():
            failures.append(f"bwd windowed {name}")

    # camera_grads=False (the fitting fast path): identical scene grads
    p_nocam = params.replace(camera_grads=False)
    ga_nc = jax.grad(
        lambda v, l: jnp.sum(
            slab_kernel.render_diff(Scene(v, scene.importance, l), m, params, 32, 32) * w
        ),
        argnums=(0, 1),
    )(scene.volume, scene.tf_lut)
    gb_nc = jax.grad(
        lambda v, l: jnp.sum(
            slab_kernel.render_diff(Scene(v, scene.importance, l), m, p_nocam, 32, 32) * w
        ),
        argnums=(0, 1),
    )(scene.volume, scene.tf_lut)
    for name, a, b in zip(("d_volume", "d_lut"), ga_nc, gb_nc):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
        print(f"bwd camera_grads=False {name}: relerr {rel:.2e}")
        if rel > 0.0 or not np.isfinite(b).all():
            failures.append(f"bwd camera_grads=False {name}")

    # sharded Pallas path on a 1-device TPU mesh: _pallas_shard_march's own
    # look-ahead/cone/smoothing plumbing (the CPU-mesh tests exercise only
    # the jnp fallback) vs the single-device kernel entry
    from volym_tpu.parallel import mesh as pmesh

    mesh1 = pmesh.make_mesh(jax.devices()[:1])
    m = Camera(aspect=1.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()
    la_vol = np.full((32, 32, 32), 0.45, np.float32)
    la_imp = np.zeros((32, 32, 32), np.float32)
    la_vol[20:26, 8:24, 8:24] = 0.9
    la_imp[20:26, 8:24, 8:24] = 1.0
    la_scene = Scene(
        volume=jnp.asarray(la_vol), importance=jnp.asarray(la_imp),
        tf_lut=scene.tf_lut,
    )
    for tag, p in (
        ("smoothing", params.replace(use_gaussian_smoothing=True)),
        ("lookahead", params.replace(use_importance_rendering=True)),
        ("lookahead cone", params.replace(
            use_importance_rendering=True, use_cone_importance_check=True
        )),
    ):
        a = np.asarray(pmesh.render_sharded(
            la_scene, m, p, 32, 32, mesh1, backend="slab_pallas"
        ))
        bimg = np.asarray(slab.render(la_scene, m, p, 32, 32))
        err = np.abs(a - bimg).max(-1)
        bad = (err > 1e-3).mean()
        print(f"sharded pallas {tag}: maxerr {err.max():.2e} frac>0.001 {bad:.2e}")
        if bad > 0.0 or not np.isfinite(a).all():
            failures.append(f"sharded pallas {tag}")

    # sharded differentiable smoothing through the Pallas kernels
    p_sm1 = params.replace(use_gaussian_smoothing=True)
    step = pmesh.make_train_step(
        p_sm1, 32, 32, mesh1, backend="slab_pallas", camera_matrices=m
    )
    target = jnp.asarray(slab.render(la_scene, m, p_sm1, 32, 32)) * 0.8
    loss_sh, grads_sh = step(la_scene, m, target)

    def loss_single(s):
        img = slab.render_diff(s, m, p_sm1, 32, 32)
        return jnp.mean((img - target) ** 2)

    loss_ref, grads_ref = jax.value_and_grad(loss_single)(la_scene)
    rel_l = abs(float(loss_sh) - float(loss_ref)) / max(abs(float(loss_ref)), 1e-9)
    a = np.asarray(grads_ref.volume)
    bb = np.asarray(grads_sh.volume)
    rel = np.abs(a - bb).max() / max(np.abs(a).max(), 1e-9)
    print(f"sharded pallas smoothed train-step: loss rel {rel_l:.2e} d_volume rel {rel:.2e}")
    if rel_l > 1e-4 or rel > 1e-2 or not np.isfinite(bb).all():
        failures.append("sharded pallas smoothed train-step")

    # u8 integer-exact streaming (RenderParams.u8_volume) vs the f32 path
    # on a u8-quantised volume: bulk must agree to float-class; a tiny
    # knife-edge population may flip threshold masks (same accounting as
    # the x3-vs-x6 exactness classes)
    u8_scene = Scene(
        volume=jnp.round(scene.volume * 255.0) / 255.0,
        importance=scene.importance,
        tf_lut=scene.tf_lut,
    )
    p_u8f = params.replace(camera_grads=False)
    for tag, p in (
        ("base", p_u8f),
        ("shaded", p_u8f.replace(use_shading=True)),
    ):
        a = np.asarray(slab_kernel.render(u8_scene, m, p, 64, 64))
        bimg = np.asarray(
            slab_kernel.render(u8_scene, m, p.replace(u8_volume=True), 64, 64)
        )
        err = np.abs(a - bimg).max(-1)
        bad = (err > 1e-3).mean()
        print(f"u8 fwd {tag}: maxerr {err.max():.2e} frac>0.001 {bad:.2e}")
        if bad > 2e-3 or not np.isfinite(bimg).all():
            failures.append(f"u8 fwd {tag}")

    def grads_u8(p):
        def loss(v, l):
            img = slab_kernel.render_diff(
                Scene(v, u8_scene.importance, l), m, p, 64, 64
            )
            return jnp.sum(img * w)
        return jax.grad(loss, argnums=(0, 1))(u8_scene.volume, u8_scene.tf_lut)

    w = jnp.cos(jnp.arange(64 * 64 * 4, dtype=jnp.float32).reshape(64, 64, 4))
    ga8 = grads_u8(p_u8f.replace(u8_volume=True))
    ga32 = grads_u8(p_u8f)
    for name, a, bb in zip(("d_volume", "d_lut"), ga32, ga8):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(np.abs(a).max(), 1e-9)
        rel = np.abs(a - bb) / scale
        n_out = int((rel > 1e-2).sum())
        bulk = np.abs(a - bb)[rel <= 1e-2].max() / scale
        print(f"u8 bwd {name}: outliers>1e-2 {n_out} bulk rel {bulk:.2e}")
        if n_out > 16 or bulk > 1e-3 or not np.isfinite(bb).all():
            failures.append(f"u8 bwd {name}")

    if failures:
        print("FAILURES:", failures)
        return 1
    print("slab kernels validated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
