"""Gradient estimation and Blinn-Phong shading (``wgsl:181-211``)."""

from __future__ import annotations

import jax.numpy as jnp

#: Central-difference offset in normalised volume coords (``wgsl:182``).
GRADIENT_OFFSET = 0.01
#: Light/material constants (``wgsl:199-207``).
LIGHT_DIR = (1.0, 1.0, 1.0)
AMBIENT = 0.2
DIFFUSE = 0.7
SPECULAR = 0.4
SHININESS = 24.0


def compute_gradient(sample_fn, pos):
    """Central-difference density gradient (``wgsl:181-188``).

    Args:
      sample_fn: pos (..., 3) -> density (...,) — the same sampler the
        march uses for the volume (the reference passes ``volume_sampler``).
      pos: (..., 3) positions.
    Returns:
      (..., 3) *unnormalised* gradient.  The WGSL normalises here and then
      checks ``length > 0`` (``wgsl:198``), which is NaN on zero gradients;
      we defer normalisation to :func:`blinn_phong` with an explicit guard —
      same shaded output on every ray where the reference is well-defined.
    """
    eps = GRADIENT_OFFSET
    grads = []
    for axis in range(3):
        off = jnp.zeros((3,), jnp.float32).at[axis].set(eps)
        hi = sample_fn(pos + off)
        lo = sample_fn(pos - off)
        grads.append((hi - lo) / (2.0 * eps))
    return jnp.stack(grads, axis=-1)


def safe_normalize(v):
    """NaN-free-gradient normalisation: returns (unit-or-zero vector, mask of
    nonzero inputs).  ``sqrt``/division at exactly zero would poison reverse-
    mode with 0/0 even under a ``jnp.where`` guard (the where-NaN trap), so
    the zero case is excluded *before* the sqrt."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    nonzero = sq > 0.0
    norm = jnp.sqrt(jnp.where(nonzero, sq, 1.0))
    return jnp.where(nonzero, v / norm, 0.0), nonzero


def blinn_phong(sample_fn, pos, color, camera_position):
    """Blinn-Phong shading of a sample (``wgsl:190-211``).

    ambient 0.2, diffuse 0.7 * max(0, n.l), specular 0.4 * max(0, h.n)^24,
    white specular; unshaded colour where the gradient vanishes.
    """
    g = compute_gradient(sample_fn, pos)
    return blinn_phong_from_gradient(g, pos, color, camera_position)


def blinn_phong_from_gradient(g, pos, color, camera_position):
    """Blinn-Phong given a precomputed (unnormalised) gradient — used by the
    replay backward, which obtains the gradient from the step's tap samples
    rather than fresh texture fetches."""
    n, nonzero = safe_normalize(g)

    light = jnp.asarray(LIGHT_DIR, jnp.float32)
    light = light / jnp.linalg.norm(light)
    eye, _ = safe_normalize(camera_position - pos)
    half, _ = safe_normalize(eye + light)

    diffuse = jnp.maximum(0.0, jnp.sum(n * light, axis=-1, keepdims=True))
    spec = jnp.maximum(0.0, jnp.sum(half * n, axis=-1, keepdims=True)) ** SHININESS
    shaded = color * (AMBIENT + DIFFUSE * diffuse) + SPECULAR * spec
    return jnp.where(nonzero, shaded, color)
