"""Multi-chip ray sharding and distributed training step.

The reference's only parallelism is SIMT over pixels inside one GPU
(16x16 workgroups, ``src/demos/pipeline.rs:83-87``).  The TPU-native
generalisation (SURVEY.md section 2, "Parallelism & distributed
communication"): shard the pixel/ray axis over a ``jax.sharding.Mesh`` with
``shard_map``, replicate the voxel grid / TF / importance (256^3 uint8 is
16 MiB — trivial in HBM), and ``psum`` the parameter gradients across the
ray axis.  XLA lowers the psum to all-reduce over ICI within a slice and DCN
across hosts; the measured schedule fuses the gradient reductions into one
tail all-reduce (~0.3% of a 1024² backward — see make_train_step and
BASELINE.md "Gradient-allreduce schedule").

Mesh axes: a single ``"rays"`` axis is the default (pure DP over rays).  A
2D ``("host", "rays")`` layout is provided for multi-host runs so that the
gradient reduction rides ICI first, DCN last.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from volym_tpu.config import RenderParams
from volym_tpu.render import diff, golden
from volym_tpu.render import rays as rays_mod
from volym_tpu.scene import Scene

RAY_AXIS = "rays"


def make_mesh(devices=None, axis_name: str = RAY_AXIS) -> Mesh:
    """1D device mesh over the ray axis."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def make_host_mesh(devices=None) -> Mesh:
    """(host, rays) mesh for multi-host pods: outer axis = process boundary
    (DCN), inner = chips within a host (ICI)."""
    devices = jax.devices() if devices is None else list(devices)
    n_hosts = max(jax.process_count(), 1)
    per_host = len(devices) // n_hosts
    arr = np.asarray(devices).reshape(n_hosts, per_host)
    return Mesh(arr, ("host", RAY_AXIS))


def _ray_count(height: int, width: int, mesh: Mesh) -> int:
    n = int(np.prod(mesh.devices.shape))
    if (height * width) % n:
        raise ValueError(
            f"{height}x{width} rays do not divide evenly over {n} devices; "
            "pad the image height to a multiple of the mesh size"
        )
    return n


def _mesh_axes(mesh: Mesh) -> tuple[str, ...]:
    return tuple(mesh.axis_names)


def render_sharded(
    scene: Scene,
    camera_matrices,
    params: RenderParams,
    height: int,
    width: int,
    mesh: Mesh,
    differentiable: bool = False,
    backend: str = "ray",
):
    """Tile-sharded render: rays split across every mesh device, scene
    replicated, no communication in the forward pass.

    Ray generation is tiny (a few multiply-adds per pixel) and runs sharded
    too — each device builds only its own rays.  ``backend="slab"`` marches
    slab-ordered (the TPU-native formulation)."""
    major = sign = 0
    planes = 0
    if backend in ("slab", "slab_pallas"):
        from volym_tpu.render import slab as slab_mod

        # same mode guards as slab.render_diff: first-hit (use_opacity=
        # False) renders forward-only — it is piecewise constant, so its
        # gradients need no backend at all (match render/diff.py)
        if differentiable and not (
            params.use_opacity or params.use_importance_coloring
        ):
            raise NotImplementedError(
                "the first-hit (use_opacity=False) mode is piecewise "
                "constant; differentiable rendering needs use_opacity=True"
            )
        # host-side static choice (camera matrices are host state)
        major, sign = slab_mod.dominant_axis(camera_matrices)
        # step-size mapping, identical to the single-device entries
        planes = slab_mod.resolve_planes(params, int(scene.volume.shape[0]))
    win_rows = shard_h = 0
    if backend == "slab_pallas":
        win_rows, shard_h = _shard_layout(
            scene, camera_matrices, params, height, width, mesh, planes,
            major, sign,
        )
    return _render_sharded_jit(
        scene, camera_matrices, params, height, width, mesh, differentiable,
        backend, major, sign, planes, win_rows, shard_h,
    )


def _shard_layout(scene, camera_matrices, params, height, width, mesh, planes, major, sign):
    """Static per-shard layout for the Pallas path (host-side, cached):
    the FULL-image static row window (covers every 32x32 tile, hence every
    shard's tiles) and the shard sub-image height.  ``shard_h`` is 0 —
    row-major chunking, window off — when the ray partition does not land
    on whole 32-divisible pixel rows."""
    from volym_tpu.ops import slab_kernel as sk

    n_dev = int(np.prod(mesh.devices.shape))
    r_shard = (height * width) // n_dev
    shard_h = r_shard // width if r_shard % width == 0 else 0
    if shard_h % sk.TILE or width % sk.TILE_W:
        shard_h = 0
    win_rows = sk.window_rows(
        camera_matrices, height, width, planes, major, sign,
        halo=sk.SMOOTH_HALO if params.use_gaussian_smoothing else 0,
        n_plane=int(scene.volume.shape[0]),
    )
    return (win_rows if shard_h else 0), shard_h


@partial(
    jax.jit,
    static_argnames=(
        "params", "height", "width", "mesh", "differentiable", "backend",
        "major", "sign", "planes", "win_rows", "shard_h",
    ),
)
def _render_sharded_jit(
    scene: Scene,
    camera_matrices,
    params: RenderParams,
    height: int,
    width: int,
    mesh: Mesh,
    differentiable: bool,
    backend: str,
    major: int,
    sign: int,
    planes: int = 0,
    win_rows: int = 0,
    shard_h: int = 0,
):
    _ray_count(height, width, mesh)
    axes = _mesh_axes(mesh)
    spec_r = P(axes)  # rays axis sharded over all mesh axes, flattened
    march = diff.march_fixed if differentiable else golden.march
    render_params = params.replace(adaptive_stepping=False) if differentiable else params

    def shard_fn(ndc):
        origin, dirs = _rays_from_ndc(camera_matrices, ndc)
        entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)
        miss = exit_ <= entry
        if backend in ("slab", "slab_pallas"):
            from volym_tpu.render import slab as slab_mod

            vol_perm = slab_mod.slab_resample(
                slab_mod.permute_volume(scene.volume, major), planes
            )
            imp_perm = slab_mod.slab_resample_nearest(
                slab_mod.permute_volume(scene.importance, major), planes
            )
            if backend == "slab_pallas" and jax.default_backend() == "tpu":
                # production kernel per shard (each device marches its own
                # ray chunk set); jnp slab fallback off-TPU keeps the same
                # sharding plumbing testable on the CPU mesh
                img = _pallas_shard_march(
                    render_params, major, sign, scene,
                    origin, dirs, entry, exit_, differentiable, planes,
                    shard_h, width, win_rows,
                )
            elif differentiable:
                grad_perm = (
                    slab_mod.slab_resample_grad(
                        slab_mod.permute_gradient(
                            slab_mod.gradient_volume(scene.volume), major
                        ),
                        planes,
                    )
                    if render_params.use_shading
                    else None
                )
                img = slab_mod.march_slabs_diff(
                    render_params, major, sign, vol_perm, imp_perm, scene.tf_lut,
                    origin, dirs, entry, jax.lax.stop_gradient(exit_), grad_perm,
                )
            else:
                grad_perm = (
                    slab_mod.slab_resample_grad(
                        slab_mod.permute_gradient(
                            slab_mod.gradient_volume(scene.volume), major
                        ),
                        planes,
                    )
                    if render_params.use_shading
                    else None
                )
                img = slab_mod.march_slabs(
                    vol_perm, imp_perm, scene.tf_lut, origin, dirs, entry, exit_,
                    major, sign, render_params, grad_perm,
                )
        elif differentiable:
            img = march(
                render_params,
                scene.volume,
                scene.importance,
                scene.tf_lut,
                origin,
                dirs,
                entry,
                jax.lax.stop_gradient(exit_),
                camera_matrices.position,
            )
        else:
            img = march(
                scene, origin, dirs, entry, exit_, camera_matrices.position, render_params
            )
        miss_color = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
        return jnp.where(miss[:, None], miss_color[None, :], img)

    ndc = rays_mod.pixel_ndc(height, width)
    img = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(spec_r,), out_specs=spec_r, check_vma=False
    )(ndc)
    return img.reshape(height, width, 4)


def _rays_from_ndc(camera_matrices, ndc):
    """Per-shard ray generation from precomputed NDC coords."""
    pos = rays_mod.unproject_ndc(camera_matrices, ndc)
    d = pos - camera_matrices.position[None, :]
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return camera_matrices.position, d


def _pallas_shard_march(params, major, sign, scene, origin, dirs, entry, exit_, differentiable, planes=0, shard_h=0, shard_w=0, win_rows=0):
    """One shard's rays through the production Pallas slab kernels, at
    single-device parity (VERDICT r4 item 2).

    Each device's rays are a contiguous raster block of the image
    (``shard_h`` x ``shard_w`` when the partition lands on whole pixel
    rows), so the shard re-applies BOTH single-device layout levers on its
    own sub-image: the 32x32 tile-order permutation (compact per-chunk
    slab footprints — the windowed contraction's fits condition) and the
    static ``win_rows`` y-window (computed over the FULL image's tiles by
    :func:`volym_tpu.ops.slab_kernel.window_rows`, so it covers every
    shard's tiles).  ``shard_h=0`` falls back to row-major chunking with
    the window off (a shard that does not tile).  Dispatch then matches
    the single-device entry (:func:`volym_tpu.ops.slab_kernel.render` /
    ``render_diff``): Gaussian smoothing in-kernel, importance look-ahead
    (straight + cone) via the reverse pre-pass on the shard's own rays,
    coloring via the importance grid."""
    from volym_tpu.ops import slab_kernel as sk
    from volym_tpu.render import slab as slab_mod

    layout = slab_mod._AXIS_LAYOUT[major]
    vol_perm = slab_mod.permute_volume(scene.volume, major)
    n_plane = vol_perm.shape[1]
    native = vol_perm.shape[0]
    if not planes:
        planes = native
    vol_perm = slab_mod.slab_resample(vol_perm, planes)
    n_slabs = planes
    if planes != native:
        # resampled slab ladder: lerped planes are not u8-representable
        params = params.replace(u8_volume=False)
    if not differentiable:
        # forward-only: camera cotangents are moot; clearing the flag
        # keeps the u8 fast path eligible (slab_kernel._u8_active)
        params = params.replace(camera_grads=False)
    if not shard_h:
        win_rows = 0
    feats = sk.features_from_rays(
        origin, dirs, entry, jax.lax.stop_gradient(exit_),
        n_slabs, major, sign, layout, n_plane=n_plane,
    )
    r = feats.shape[1]

    def chunk(mat):
        return (
            sk._chunk_rays(mat, shard_h, shard_w)
            if shard_h
            else sk._chunk_flat(mat)
        )

    fc = chunk(feats)
    lookahead = (
        params.use_importance_rendering and not params.use_importance_coloring
    )
    imp_perm = (
        slab_mod.slab_resample_nearest(
            slab_mod.permute_volume(scene.importance, major), planes
        )
        if (params.use_importance_coloring or lookahead)
        else None
    )
    grad_perm = (
        slab_mod.slab_resample_grad(
            slab_mod.permute_gradient(
                slab_mod.gradient_volume(scene.volume), major
            ),
            planes,
        )
        if params.use_shading
        else None
    )
    ahead = None
    if lookahead:
        from volym_tpu.ops import lookahead_kernel

        # the ahead bits are a zero-gradient gate (pure comparisons):
        # the pre-pass always runs on stop_gradient'ed inputs
        cone_feats = (
            chunk(
                sk.cone_features_from_rays(
                    jax.lax.stop_gradient(origin), jax.lax.stop_gradient(dirs),
                    n_slabs, major, sign, layout, n_plane=n_plane,
                )
            )
            if params.use_cone_importance_check
            else None
        )
        ahead = lookahead_kernel.lookahead_call(
            sign, jax.lax.stop_gradient(imp_perm),
            jax.lax.stop_gradient(fc), cone_feats, win_rows,
            subtexel=params.subtexel_bits,
        )
    knobs = params.knobs()
    # the compacted grid (sk.pair_buckets) is a per-shard static the SPMD
    # program cannot vary per device; shards run the full (blocks, chunks)
    # grid (pairs=()) — the measured sharded overhead stays within the
    # BASELINE budget either way
    if differentiable:
        if params.use_importance_coloring:
            # grad_perm non-None = the combined coloring+shading mode
            out = sk.march_pallas_coloring(
                params, major, sign, win_rows, (), vol_perm, imp_perm, fc,
                grad_perm, knobs,
            )
        elif lookahead:
            out = sk.march_pallas_lookahead(
                params, major, sign, win_rows, (), vol_perm, imp_perm,
                scene.tf_lut, fc, ahead, grad_perm, knobs,
            )
        elif params.use_shading:
            out = sk.march_pallas_shaded(
                params, major, sign, win_rows, (), vol_perm, grad_perm,
                scene.tf_lut, fc, knobs,
            )
        else:
            out = sk.march_pallas(
                params, major, sign, win_rows, (), vol_perm, scene.tf_lut,
                fc, knobs,
            )
    else:
        out = sk._forward_call(
            params, sign, vol_perm, scene.tf_lut, fc, imp_perm, grad_perm,
            win_rows, ahead,
        )
    return (
        sk._unchunk_tiled(out, r, shard_h, shard_w)
        if shard_h
        else sk._unchunk_flat(out, r)
    )


def make_train_step(
    params: RenderParams,
    height: int,
    width: int,
    mesh: Mesh,
    backend: str = "ray",
    camera_matrices=None,
    split_psum: bool = False,
):
    """Distributed inverse-rendering step (BASELINE.json config 5).

    Returns ``step(scene, camera_matrices, target) -> (loss, grads)`` with
    rays sharded over the mesh and scene gradients psum'd across it.
    Schedule shape, from the compiled HLO (scripts/probe_overlap.py): XLA
    merges the gradient psums into ONE tuple all-reduce at the end of the
    module — no overlap with backward compute, and none needed at this
    scale (the fused reduction moves ~33 MB, ~0.4 ms on ICI vs a 137 ms
    1024² backward).

    ``split_psum=True`` is the lever for a DCN-dominated multi-host
    reduction (BASELINE north star: "grad allreduce overlapped with the
    backward"): the small, early-finishing gradients (TF LUT, importance)
    psum in their OWN all-reduce, which depends only on its own cotangents
    and can therefore be issued by the latency-hiding scheduler while the
    volume-grad scatter is still computing; an ``optimization_barrier``
    then pins the volume all-reduce after them, which keeps XLA's
    all-reduce combiner from fusing everything back into one tail tuple
    reduce (the default, measured-optimal single-slice schedule).  The
    schedule split is asserted from the compiled HLO in
    ``tests/test_parallel.py::test_split_psum_hlo_schedule``.

    ``backend``: ``"ray"`` (t-step replay VJP), ``"slab"`` (jnp slab replay
    VJP), or ``"slab_pallas"`` (the production Pallas kernels; jnp slab
    fallback off-TPU so the same plumbing runs on the CPU test mesh).  The
    slab backends need ``camera_matrices`` at factory time for the static
    dominant-axis choice (pass the training camera; the step itself still
    takes per-call matrices for pose refinement around it).
    """
    # a TRAIN step optimizes the volume: it leaves the u8 grid on the
    # first update, so the u8 streaming mode (a rendering mode for
    # u8-representable volumes) is force-cleared here like optim.fit_scene
    fixed = params.replace(adaptive_stepping=False, u8_volume=False)
    if not (params.use_opacity or params.use_importance_coloring):
        # same guard as render/diff.py:336 and slab.render_diff: the replay
        # VJPs reconstruct per-step transmittance from the alpha-compositing
        # identity, which does not hold for a first-hit forward — without
        # this they would return nonzero, meaningless gradients
        raise NotImplementedError(
            "the first-hit (use_opacity=False) mode is piecewise constant; "
            "differentiable rendering needs use_opacity=True"
        )
    _ray_count(height, width, mesh)
    axes = _mesh_axes(mesh)
    spec_r = P(axes)
    major = sign = 0
    planes = 0
    if backend in ("slab", "slab_pallas"):
        from volym_tpu.render import slab as slab_mod

        if camera_matrices is None:
            raise ValueError("slab train-step backends need camera_matrices")
        major, sign = slab_mod.dominant_axis(camera_matrices)

    def per_shard_loss(scene, camera_matrices, ndc, target_rows, win_rows=0, shard_h=0):
        from volym_tpu.render import slab as slab_mod

        origin, dirs = _rays_from_ndc(camera_matrices, ndc)
        entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)
        miss = exit_ <= entry
        if backend == "slab_pallas" and jax.default_backend() == "tpu":
            img = _pallas_shard_march(
                fixed, major, sign, scene, origin, dirs, entry, exit_, True,
                slab_mod.resolve_planes(fixed, int(scene.volume.shape[0])),
                shard_h, width, win_rows,
            )
        elif backend in ("slab", "slab_pallas"):
            p_ = slab_mod.resolve_planes(fixed, int(scene.volume.shape[0]))
            grad_perm = (
                slab_mod.slab_resample_grad(
                    slab_mod.permute_gradient(
                        slab_mod.gradient_volume(scene.volume), major
                    ),
                    p_,
                )
                if fixed.use_shading
                else None
            )
            img = slab_mod.march_slabs_diff(
                fixed, major, sign,
                slab_mod.slab_resample(
                    slab_mod.permute_volume(scene.volume, major), p_
                ),
                slab_mod.slab_resample_nearest(
                    slab_mod.permute_volume(scene.importance, major), p_
                ),
                scene.tf_lut, origin, dirs, entry,
                jax.lax.stop_gradient(exit_), grad_perm,
            )
        else:
            img = diff.march_fixed(
                fixed,
                scene.volume,
                scene.importance,
                scene.tf_lut,
                origin,
                dirs,
                entry,
                jax.lax.stop_gradient(exit_),
                camera_matrices.position,
            )
        miss_color = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
        img = jnp.where(miss[:, None], miss_color[None, :], img)
        # mean over the *global* pixel count: sum local, divide by global
        return jnp.sum((img - target_rows) ** 2)

    n_pixels = height * width * 4

    def shard_fn(scene, camera_matrices, ndc, target_rows, win_rows=0, shard_h=0):
        local_sq, grads = jax.value_and_grad(per_shard_loss)(
            scene, camera_matrices, ndc, target_rows, win_rows, shard_h
        )
        loss = jax.lax.psum(local_sq, axes) / n_pixels
        if not split_psum:
            grads = jax.tree_util.tree_map(
                lambda gr: jax.lax.psum(gr, axes) / n_pixels, grads
            )
            return loss, grads
        # split lever (see make_train_step docstring): small grads reduce
        # in their own all-reduce, and the volume all-reduce is made
        # data-dependent on its RESULT so the all-reduce combiner cannot
        # re-merge them.  The dependency is real arithmetic, not an
        # optimization_barrier: XLA's barrier expander can run before the
        # combiner (observed on the CPU pipeline), dissolving a
        # barrier-only ordering.  ``s - s`` is exactly +0.0 for finite s
        # and floats are not x-x-foldable (NaN/Inf), so the add survives
        # optimization, fuses into the scatter epilogue, and leaves the
        # gradients bit-identical (loss grads are finite by construction).
        small = jax.tree_util.tree_map(
            lambda gr: jax.lax.psum(gr, axes) / n_pixels,
            (grads.importance, grads.tf_lut),
        )
        s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(small))
        # nan_to_num: exactly +0.0 even if a small-grad entry is inf/NaN
        # (plain s - s would poison the whole volume gradient then), while
        # remaining a REAL data dependency XLA cannot fold away
        zero = jnp.nan_to_num(s - s, nan=0.0, posinf=0.0, neginf=0.0)
        d_vol = jax.lax.psum(grads.volume + zero, axes) / n_pixels
        grads = Scene(volume=d_vol, importance=small[0], tf_lut=small[1])
        return loss, grads

    @partial(jax.jit, static_argnames=("win_rows", "shard_h"))
    def _step(scene, camera_matrices, target, win_rows=0, shard_h=0):
        ndc = rays_mod.pixel_ndc(height, width)
        target_rows = target.reshape(-1, 4)
        return jax.shard_map(
            partial(shard_fn, win_rows=win_rows, shard_h=shard_h),
            mesh=mesh,
            in_specs=(P(), P(), spec_r, spec_r),
            out_specs=(P(), P()),
            check_vma=False,
        )(scene, camera_matrices, ndc, target_rows)

    if backend != "slab_pallas":
        return _step

    def step(scene, camera_matrices, target):
        # per-call static layout, matching the single-device render_diff
        # entry: the row window follows the CALL's camera (host state), so
        # pose refinement around the factory camera stays covered, and the
        # window ladder bounds the jit-key count per (major, sign)
        from volym_tpu.render import slab as slab_mod

        win_rows, shard_h = _shard_layout(
            scene, camera_matrices, fixed, height, width, mesh,
            slab_mod.resolve_planes(fixed, int(scene.volume.shape[0])),
            major, sign,
        )
        return _step(
            scene, camera_matrices, target, win_rows=win_rows,
            shard_h=shard_h,
        )

    return step
