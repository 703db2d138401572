"""Compacted live-pair grid (slab_kernel.build_pairs / pair_buckets).

The compacted grid must be a pure iteration-order optimisation: outputs
and gradients BIT-IDENTICAL to the full (n_blocks, n_chunks) grid, with a
sound static bucket (host bound >= device pair count for any camera) and
a loud NaN frame when the bound is ever violated.

Runs the real kernel bodies through the eager emulator (tests/pallas_emu)
at 64x128 rays (8 chunks -> the inverted-grid regime the compaction
requires) on a 16^3 sphere.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.pallas_emu import emulate
from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_bwd_kernel, slab_kernel
from volym_tpu.render import slab

H, W = 64, 128  # 2x4 = 8 chunks: inverted grid, 16 (chunk, block) pairs
N = 16

BASE = RenderParams(
    interpolation="trilinear",
    raymarching_step_size=1.0 / N,
    use_gaussian_smoothing=False,
    use_shading=False,
    camera_grads=False,
    u8_volume=False,
)


@pytest.fixture(scope="module")
def scene():
    return Scene.synthetic("sphere", side=N)


def _setup(m, params):
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    vol_perm = slab.permute_volume(Scene.synthetic("sphere", side=N).volume, major)
    feats, miss, r = slab_kernel._chunked_feats(
        m, H, W, vol_perm.shape[0], major, sign, layout
    )
    return major, sign, vol_perm, feats


def _bucket(m, major, sign):
    """Small-scale analog of pair_buckets: host live count + block pads,
    no ladder rounding (the production quantum would round tiny grids up
    to the full size and disable compaction)."""
    live = slab_kernel._host_pair_live(m, H, W, N, major, sign, slab_kernel.SLAB_BATCH)
    return int(live.sum()) + live.shape[1]


def test_fwd_bwd_bitwise_equal(scene):
    m = Camera(aspect=2.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()
    params = BASE.pallas_static()
    major, sign, vol_perm, feats = _setup(m, params)
    n_pairs = _bucket(m, major, sign)
    total = feats.shape[0] * (N // slab_kernel.SLAB_BATCH)
    assert n_pairs < total, "test camera must leave dead pairs to compact"
    knobs = params.knobs()
    gw = jnp.asarray(
        np.random.RandomState(0).rand(
            feats.shape[0], 4, slab_kernel.RAYS_PER_CHUNK
        ),
        jnp.float32,
    )

    def run(pairs):
        def loss(vol, lut):
            out = slab_kernel.march_pallas(
                params, major, sign, 0, pairs, vol, lut, feats, knobs
            )
            return jnp.sum(out * gw), out

        with emulate(slab_kernel, slab_bwd_kernel):
            (_, out), grads = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True
            )(vol_perm, scene.tf_lut)
        return out, grads

    out_f, (dv_f, dl_f) = run(())
    out_c, (dv_c, dl_c) = run((n_pairs,))
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_c))
    np.testing.assert_array_equal(np.asarray(dv_f), np.asarray(dv_c))
    np.testing.assert_array_equal(np.asarray(dl_f), np.asarray(dl_c))


def test_overflow_poisons_loudly(scene):
    """A too-small bucket must NaN the frame and the gradients, never
    silently drop march work (build_pairs contract)."""
    m = Camera(aspect=2.0, distance=1.2).orbit(30.0, 20.0, 0.0).matrices()
    params = BASE.pallas_static()
    major, sign, vol_perm, feats = _setup(m, params)
    knobs = params.knobs()

    def loss(vol):
        out = slab_kernel.march_pallas(
            params, major, sign, 0, (4,), vol, scene.tf_lut, feats, knobs
        )
        return jnp.sum(out), out

    with emulate(slab_kernel, slab_bwd_kernel):
        (_, out), dv = jax.value_and_grad(loss, has_aux=True)(vol_perm)
    assert bool(jnp.isnan(out).any())
    assert bool(jnp.isnan(dv).any())


def test_fwd_bitwise_equal_positive_sign(scene):
    """The bitwise fwd+bwd test's camera marches sign < 0; a sign > 0
    march flips the physical slab index map — the pair table must still
    stream and accumulate identically there."""
    m = Camera(aspect=2.0, distance=1.2).orbit(210.0, -15.0, 0.0).matrices()
    params = BASE.pallas_static()
    major, sign, vol_perm, feats = _setup(m, params)
    assert sign > 0, "camera chosen for a positive-sign march"
    n_pairs = _bucket(m, major, sign)
    knobs = params.knobs()

    def run(pairs):
        with emulate(slab_kernel):
            return np.asarray(
                slab_kernel._forward_call(
                    params, sign, vol_perm, scene.tf_lut, feats,
                    win_rows=0, knobs=knobs, pairs=pairs,
                )
            )

    np.testing.assert_array_equal(run(()), run((n_pairs,)))


@pytest.mark.parametrize("orbit", [(0, 0), (45, 30), (120, -40), (200, 60), (300, -75)])
def test_host_bound_covers_device_count(orbit):
    """pair_buckets' numpy bound (±1-slab widened intervals) must cover
    build_pairs' exact traced count for any camera — the compacted grid
    drops work (NaN-poisons) iff this containment ever breaks."""
    yaw, pitch = orbit
    m = Camera(aspect=2.0, distance=1.5).orbit(float(yaw), float(pitch), 0.0).matrices()
    major, sign = slab.dominant_axis(m)
    layout = slab._AXIS_LAYOUT[major]
    sb = slab_kernel.SLAB_BATCH
    feats, _, _ = slab_kernel._chunked_feats(m, H, W, N, major, sign, layout)
    host = slab_kernel._host_pair_live(m, H, W, N, major, sign, sb)
    _, _, overflow = slab_kernel.build_pairs(
        feats, N, sb, int(host.sum()) + host.shape[1]
    )
    assert not bool(overflow)
    # containment, not just counts: every device-live pair is host-live
    jf = jnp.arange(N, dtype=jnp.float32)[None, :, None]
    row = lambda i: feats[:, i, :][:, None, :]
    t = row(slab_kernel.F_TS) * jf + row(slab_kernel.F_TB)
    active = (
        (row(slab_kernel.F_SIGNOK) > 0.5)
        & (t >= row(slab_kernel.F_ENTRY))
        & (t < row(slab_kernel.F_EXIT))
    )
    geo = np.asarray(
        jnp.any(active, axis=2).reshape(feats.shape[0], N // sb, sb).any(axis=2)
    )
    assert not (geo & ~host).any(), "device-live pair outside the host bound"


def test_pair_buckets_ladder_and_cache():
    """Production-scale bucketing: coarse quantum, dead-pair headroom,
    disabled when the bucket would not beat the full grid."""
    m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()
    slab_kernel._pair_cache.clear()
    major, sign = slab.dominant_axis(m)
    pairs = slab_kernel.pair_buckets(m, 256, 256, 256, major, sign)
    assert len(pairs) == 1
    total = (256 * 256 // slab_kernel.RAYS_PER_CHUNK) * (256 // slab_kernel.SLAB_BATCH)
    if pairs[0]:
        assert pairs[0] % 128 == 0
        assert pairs[0] <= 0.9 * total
        live = slab_kernel._host_pair_live(m, 256, 256, 256, major, sign, slab_kernel.SLAB_BATCH)
        assert pairs[0] >= live.sum() + live.shape[1]
    # cached on the second call
    assert slab_kernel.pair_buckets(m, 256, 256, 256, major, sign) is pairs
