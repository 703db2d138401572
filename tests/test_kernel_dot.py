"""Error-bound pin for the kernel's exact-contraction implementations.

``slab_kernel.kernel_dot`` routes HIGHEST-precision MXU contractions
through :data:`slab_kernel.EXACT_DOT`: "x6" (Mosaic HIGHEST, 6 bf16
passes, fp32-faithful) or "x3" (manual hi/lo split, 3 bf16 passes,
drops only the lo@lo term).  On CPU, ``astype(bfloat16)`` performs the
same rounding the TPU MXU applies to each pass and the accumulation is
f32 either way, so the x3 error measured here is the hardware error.

The bound: x3 = a@b - a_lo@b_lo with |a_lo| <= 2^-9 |a| elementwise
(bf16 has 8 significand bits), so |x3 - a@b| <= 2^-18 (|a|@|b|) up to
the split's own rounding and the f32 accumulation of the three passes —
pinned at 2^-15 (|a|@|b|) + eps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volym_tpu.ops import slab_kernel

DIMS = (((0,), (0,)), ((), ()))  # contract the leading axis, as the kernel does


def _pair(rng, shape_a, shape_b, kind):
    if kind == "uniform":
        a = rng.uniform(-1.0, 1.0, shape_a)
        b = rng.uniform(-1.0, 1.0, shape_b)
    elif kind == "volume-hat":
        # the kernel's actual operand statistics: a uint8-origin slice
        # against a two-entry triangle-hat matrix
        a = rng.integers(0, 256, shape_a).astype(np.float64) / 255.0
        coords = rng.uniform(0.0, shape_a[0] - 1.0, shape_b[1])
        idx = np.arange(shape_b[0])[:, None]
        b = np.maximum(0.0, 1.0 - np.abs(coords[None, :] - idx))
    else:  # heavy-tailed cotangents
        a = rng.standard_normal(shape_a) * 10.0 ** rng.uniform(-3, 3, shape_a)
        b = rng.standard_normal(shape_b)
    return jnp.float32(a), jnp.float32(b)


@pytest.mark.parametrize("kind", ["uniform", "volume-hat", "cotangent"])
def test_x3_error_bound(kind):
    rng = np.random.default_rng(0)
    a, b = _pair(rng, (96, 64), (96, 128), kind)
    exact = jax.lax.dot_general(
        a, b, DIMS, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    old = slab_kernel.EXACT_DOT
    try:
        slab_kernel.EXACT_DOT = "x3"
        approx = slab_kernel.kernel_dot(a, b, DIMS, jax.lax.Precision.HIGHEST)
    finally:
        slab_kernel.EXACT_DOT = old
    scale = jax.lax.dot_general(
        jnp.abs(a), jnp.abs(b), DIMS, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    bound = 2.0 ** -15 * np.asarray(scale) + 1e-7
    err = np.abs(np.asarray(approx) - np.asarray(exact))
    assert (err <= bound).all(), float((err / np.maximum(bound, 1e-30)).max())


def test_x6_is_passthrough():
    rng = np.random.default_rng(1)
    a, b = _pair(rng, (32, 16), (32, 48), "uniform")
    exact = jax.lax.dot_general(
        a, b, DIMS, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    old = slab_kernel.EXACT_DOT
    try:
        slab_kernel.EXACT_DOT = "x6"
        out = slab_kernel.kernel_dot(a, b, DIMS, jax.lax.Precision.HIGHEST)
    finally:
        slab_kernel.EXACT_DOT = old
    np.testing.assert_array_equal(np.asarray(out), np.asarray(exact))


def test_non_highest_ignores_exact_dot():
    rng = np.random.default_rng(2)
    a, b = _pair(rng, (32, 16), (32, 48), "uniform")
    old = slab_kernel.EXACT_DOT
    try:
        slab_kernel.EXACT_DOT = "x3"
        out = slab_kernel.kernel_dot(a, b, DIMS, jax.lax.Precision.DEFAULT)
    finally:
        slab_kernel.EXACT_DOT = old
    ref = jax.lax.dot_general(
        a, b, DIMS, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
