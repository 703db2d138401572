"""Static Mosaic-compatibility lint of every Pallas kernel jaxpr.

The eager emulator (tests/pallas_emu.py) checks semantics and the trace
sweep (tests/test_trace_sweep.py) checks both-sides tracing, but neither
runs Mosaic's TPU lowering — so ops that trace fine yet have no Mosaic
lowering rule only crash at first contact with hardware.  Two such
classes broke the production path this round:

- ``lax.rev`` (``x[::-1]``): no Mosaic lowering at all
- ``squeeze`` of a bool array to a scalar: Mosaic only converts 32-bit
  element types to scalars

This lint traces every kernel mode (both grid layouts, both march signs)
with ``jax.make_jaxpr`` and walks the ``pallas_call`` sub-jaxprs for
those patterns, so the known-unlowerable ops fail CI on CPU, without a
TPU (tracing all ~90 mode combinations takes a couple of minutes),
instead of at compile time on the chip.

A third Mosaic-only failure class from the same round —
sublane-offset-mismatched lane concatenation in the wide cone sample —
has no jaxpr-level signature (the offsets are a layout property); it is
prevented structurally by the CF_STRIDE=8 padding of the cone-feature
rows (ops/slab_kernel.py), not by this lint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest
from jax.extend import core as jex_core

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.ops import slab_kernel

from test_trace_sweep import MODES, _params

# negative-march (major=(2,-1)) and positive-march (major=(2,1)) cameras:
# the occupancy meta takes a different, sign-dependent code path
CAMS = {
    "neg": Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices(),
    "pos": Camera(aspect=1.0, distance=1.0).orbit(200.0, 10.0, 0.0).matrices(),
}


def _sub_jaxprs(params):
    for v in params.values():
        vs = v if isinstance(v, (tuple, list)) else (v,)
        for x in vs:
            if isinstance(x, jex_core.ClosedJaxpr):
                yield x.jaxpr
            elif isinstance(x, jex_core.Jaxpr):
                yield x


def _lint(jaxpr, inside_pallas, bad, path):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        here = inside_pallas or name == "pallas_call"
        if inside_pallas:
            if name == "rev":
                bad.append(f"{path}: lax.rev (no Mosaic lowering)")
            if name == "squeeze" and eqn.invars[0].aval.dtype == jnp.bool_:
                if not eqn.outvars[0].aval.shape:
                    bad.append(
                        f"{path}: squeeze of bool to scalar "
                        "(Mosaic squeezes 32-bit elements only)"
                    )
        for sub in _sub_jaxprs(eqn.params):
            _lint(sub, here, bad, path + "/" + name)


def _assert_clean(fn):
    jaxpr = jax.make_jaxpr(fn)()
    bad: list[str] = []
    _lint(jaxpr.jaxpr, False, bad, "root")
    assert not bad, "\n".join(bad)


@pytest.mark.parametrize("cam", sorted(CAMS))
@pytest.mark.parametrize("res", [32, 96], ids=["chunk_outer", "slab_outer"])
@pytest.mark.parametrize("mode", sorted(MODES))
def test_forward_mosaic_lint(mode, res, cam):
    scene = Scene.synthetic("bonsai", side=32)
    params = _params(**MODES[mode])
    _assert_clean(
        lambda: slab_kernel.render(scene, CAMS[cam], params, res, res)
    )


@pytest.mark.parametrize("cam", sorted(CAMS))
@pytest.mark.parametrize("res", [32, 96], ids=["chunk_outer", "slab_outer"])
@pytest.mark.parametrize(
    "mode", sorted(m for m in MODES if m not in ("first_hit",))
)
def test_backward_mosaic_lint(mode, res, cam):
    scene = Scene.synthetic("bonsai", side=32)
    params = _params(**MODES[mode])

    def loss(vol, lut):
        img = slab_kernel.render_diff(
            Scene(vol, scene.importance, lut), CAMS[cam], params, res, res
        )
        return jnp.sum(img)

    _assert_clean(
        lambda: jax.grad(loss, argnums=(0, 1))(scene.volume, scene.tf_lut)
    )
