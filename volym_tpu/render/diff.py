"""Differentiable renderer: fixed-step march with a memory-free custom VJP.

BASELINE.json's differentiable mode: gradients w.r.t. voxel densities, the
transfer-function LUT, and the camera pose, "propagated through
early-ray-termination via saved per-step transmittance".  We go one better
than saving per-step transmittance (O(rays * steps) memory): the compositing
recurrence is *invertible in the forward direction*, so the backward pass
replays the march front-to-back, reconstructing the per-step transmittance
``T_k = 1 - acc_a_k`` from the running accumulator and obtaining the suffix
sums it needs from the (saved) final image:

    acc_c = sum_k w_k c_k,  w_k = T_k beta_k,  T_k = prod_{j<k}(1 - beta_j)

    dL/dc_k    = g_c * w_k
    dL/dbeta_k = T_k (g_c . c_k + g_a)
                 - (g_c . S_c^{>k} + g_a S_a^{>k}) / (1 - beta_k)

with ``S^{>k} = final - prefix_{<=k}`` — O(rays) memory total, one extra
forward-cost sweep.  Per-step local derivatives (through Gaussian smoothing,
TF lookup, Blinn-Phong shading and trilinear sampling) are obtained with a
per-step ``jax.vjp``, so the chain rule stays machine-derived; only the
compositing transpose is hand-written.

Discrete decisions (density threshold, early termination, importance
look-ahead skip) are treated as constants of the backward pass — the
standard straight-through choice for volume rendering; they are recomputed
bit-identically during the replay because the replay *is* the forward
recurrence.

The adaptive step (``wgsl:262-269``) is forward-only; this path fixes the
step size so sample positions are an affine function of (entry, k), which is
what makes camera gradients well-defined (SURVEY.md section 7 hard part (a)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from volym_tpu.config import Interpolation, RenderParams
from volym_tpu.ops import interp
from volym_tpu.render import rays as rays_mod
from volym_tpu.render import shading
from volym_tpu.render.golden import (
    IMPORTANCE_OPAQUE,
    has_important_ahead_cone,
    has_important_ahead_straight,
    importance_to_color,
    sample_density,
)
from volym_tpu.transfer_function import lut_sample

_EPS_ONE_MINUS_BETA = 1e-7


def _sample_and_shade(params: RenderParams, volume, importance, lut, origin, dirs, entry, cam_pos, k):
    """Differentiable per-step quantities (``wgsl:251-314`` minus control flow).

    Returns (shaded_rgb (R,3), alpha (R,), density (R,), imp (R,)).
    """
    sample_fn = interp.make_sampler(params.interpolation)
    step = params.raymarching_step_size
    t = entry + k * jnp.float32(step)
    pos = origin[None, :] + dirs * t[:, None]
    density = sample_density(volume, pos, dirs, params, sample_fn)
    imp = interp.sample_nearest(importance, pos)
    if params.use_importance_coloring:
        ca = importance_to_color(imp)
    else:
        ca = lut_sample(lut, density)
    if params.use_shading:
        shaded = shading.blinn_phong(
            lambda p: sample_fn(volume, p), pos, ca[..., :3], cam_pos
        )
    else:
        shaded = ca[..., :3]
    alpha = 1.0 - jnp.power(1.0 - ca[..., 3], jnp.float32(step * 100.0))
    return shaded, alpha, density, imp


def _contribute_mask(params: RenderParams, importance_grid, density, imp, origin, dirs, entry, exit_, acc_a, k):
    """The non-differentiable march decisions, recomputed identically in the
    forward and replay sweeps (all inputs stop-gradiented by construction of
    where this is used)."""
    step = jnp.float32(params.raymarching_step_size)
    t = entry + k * step
    active = (t < exit_) & (acc_a < params.early_termination_alpha)
    dense = density >= params.density_threshold
    skip = ~dense
    if params.use_importance_rendering and not params.use_importance_coloring:
        pos = origin[None, :] + dirs * t[:, None]
        if params.use_cone_importance_check:
            ahead = has_important_ahead_cone(
                importance_grid, pos, dirs, exit_, params.importance_check_ahead_steps
            )
        else:
            ahead = has_important_ahead_straight(
                importance_grid, pos, dirs, exit_, params.importance_check_ahead_steps
            )
        skip = skip | ((imp < IMPORTANCE_OPAQUE) & ahead)
    return active & ~skip


def _march_scan(params: RenderParams, volume, importance, lut, origin, dirs, entry, exit_, cam_pos):
    """Forward fixed-step march (primal)."""
    num_steps = params.resolved_max_steps()

    def body(carry, k):
        acc_c, acc_a = carry
        shaded, alpha, density, imp = _sample_and_shade(
            params, volume, importance, lut, origin, dirs, entry, cam_pos, k
        )
        m = _contribute_mask(
            params, importance, density, imp, origin, dirs, entry, exit_, acc_a, k
        )
        beta = alpha * m
        w = (1.0 - acc_a) * beta
        acc_c = acc_c + shaded * w[:, None]
        acc_a = acc_a + w
        return (acc_c, acc_a), None

    r = dirs.shape[0]
    init = (jnp.zeros((r, 3), jnp.float32), jnp.zeros((r,), jnp.float32))
    (acc_c, acc_a), _ = jax.lax.scan(
        body, init, jnp.arange(num_steps, dtype=jnp.float32)
    )
    return jnp.concatenate([acc_c, acc_a[:, None]], axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def march_fixed(params: RenderParams, volume, importance, lut, origin, dirs, entry, exit_, cam_pos):
    """Fixed-step differentiable march of R rays -> (R, 4) RGBA."""
    return _march_scan(params, volume, importance, lut, origin, dirs, entry, exit_, cam_pos)


def _march_fwd(params, volume, importance, lut, origin, dirs, entry, exit_, cam_pos):
    img = _march_scan(params, volume, importance, lut, origin, dirs, entry, exit_, cam_pos)
    return img, (volume, importance, lut, origin, dirs, entry, exit_, cam_pos, img)


def _march_bwd(params: RenderParams, res, g):
    volume, importance, lut, origin, dirs, entry, exit_, cam_pos, img = res
    g_c, g_a = g[:, :3], g[:, 3]
    fin_c, fin_a = img[:, :3], img[:, 3]
    num_steps = params.resolved_max_steps()

    zeros_like = jax.tree_util.tree_map(jnp.zeros_like, (volume, importance, lut, origin, dirs, entry, cam_pos))

    def body(carry, k):
        acc_c, acc_a, grads = carry

        def f(volume_, importance_, lut_, origin_, dirs_, entry_, cam_pos_):
            shaded, alpha, density, imp = _sample_and_shade(
                params, volume_, importance_, lut_, origin_, dirs_, entry_, cam_pos_, k
            )
            return (shaded, alpha), (density, imp)

        (shaded, alpha), f_vjp, (density, imp) = jax.vjp(
            f, volume, importance, lut, origin, dirs, entry, cam_pos, has_aux=True
        )
        m = _contribute_mask(
            params, importance, density, imp, origin, dirs, entry, exit_, acc_a, k
        )
        beta = alpha * m
        t_k = 1.0 - acc_a  # prefix transmittance, reconstructed
        w = t_k * beta

        new_acc_c = acc_c + shaded * w[:, None]
        new_acc_a = acc_a + w
        suf_c = fin_c - new_acc_c  # S_c^{>k}
        suf_a = fin_a - new_acc_a  # S_a^{>k}

        d_c = g_c * w[:, None]
        inv = 1.0 / jnp.maximum(1.0 - beta, _EPS_ONE_MINUS_BETA)
        d_beta = (
            t_k * (jnp.sum(g_c * shaded, axis=-1) + g_a)
            - (jnp.sum(g_c * suf_c, axis=-1) + g_a * suf_a) * inv
        )
        d_alpha = jnp.where(m, d_beta, 0.0)

        step_grads = f_vjp((d_c, d_alpha))
        grads = jax.tree_util.tree_map(jnp.add, grads, step_grads)
        return (new_acc_c, new_acc_a, grads), None

    r = dirs.shape[0]
    init = (jnp.zeros((r, 3), jnp.float32), jnp.zeros((r,), jnp.float32), zeros_like)
    (_, _, grads), _ = jax.lax.scan(body, init, jnp.arange(num_steps, dtype=jnp.float32))
    d_volume, d_importance, d_lut, d_origin, d_dirs, d_entry, d_cam = grads
    d_exit = jnp.zeros_like(exit_)  # enters through masks only
    return (d_volume, d_importance, d_lut, d_origin, d_dirs, d_entry, d_exit, d_cam)


march_fixed.defvjp(_march_fwd, _march_bwd)


@partial(jax.jit, static_argnames=("params", "height", "width"))
def render(scene, camera_matrices, params: RenderParams, height: int, width: int):
    """Differentiable render -> (H, W, 4).

    Like :func:`volym_tpu.render.golden.render` but fixed-step with the
    custom replay VJP.  ``jax.grad`` of any scalar of the output propagates
    to ``scene.volume`` / ``scene.importance`` / ``scene.tf_lut`` and to the
    camera matrices/position (use trilinear interpolation for non-trivial
    position gradients).
    """
    if not (params.use_opacity or params.use_importance_coloring):
        raise NotImplementedError(
            "the first-hit (use_opacity=False) mode is piecewise constant; "
            "use the golden renderer for it"
        )
    params = params.replace(adaptive_stepping=False)
    origin, dirs = rays_mod.generate_rays(camera_matrices, height, width)
    entry, exit_ = rays_mod.ray_box_intersection(origin, dirs)
    miss = exit_ <= entry
    img = march_fixed(
        params,
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
    return img.reshape(height, width, 4)
