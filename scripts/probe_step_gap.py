"""Quantify the slab-vs-reference discretisation gap (VERDICT r3 item 3).

The production slab path marches volume-aligned planes; the reference
marches uniform t-steps (``wgsl:243-326``).  Same physics, different
quadrature.  This probe measures, at the benchmark camera on the bonsai
256³ stand-in:

  1. the image delta between the slab render at each step-size ladder
     point (planes in {1024, 512, 256, 128, 64}) and the t-step golden at
     the matching step size — the "does the fast path render the
     reference's picture" number;
  2. the slab-internal convergence (each ladder point vs planes=1024) —
     the quadrature-refinement trend;
  3. per-row forward frame time, so the step-size sweep's cost/quality
     trade-off is explicit.

Run on TPU: python scripts/probe_step_gap.py  (CPU works, slowly, at
reduced resolution).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import marginal_time
from volym_tpu.render import golden
from volym_tpu.render import slab as slab_mod

on_tpu = jax.devices()[0].platform == "tpu"
SIDE = 256 if on_tpu else 32
RES = 256 if on_tpu else 32
scene = Scene.synthetic("bonsai", side=SIDE)
cam = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0)
m = cam.matrices()

if on_tpu:
    from volym_tpu.ops import slab_kernel as slab_impl
else:
    slab_impl = slab_mod

BASE = dict(
    density_threshold=0.15,
    use_gaussian_smoothing=False,
    interpolation="trilinear",
    adaptive_stepping=False,
    use_shading=False,
)

# sweep the reference benchmark steps plus a supersampling point
steps = [0.001, 0.003, 0.005, 0.010, 0.020] if on_tpu else [0.01, 0.03, 0.06]
imgs, times = {}, {}
for step in steps:
    p = RenderParams(raymarching_step_size=step, **BASE)
    planes = slab_mod.resolve_planes(p, SIDE)
    f = jax.jit(
        lambda v, l, p=p: slab_impl.render(
            Scene(v, scene.importance, l), m, p, RES, RES
        )
    )
    img = np.asarray(f(scene.volume, scene.tf_lut))
    ms = marginal_time(lambda: f(scene.volume, scene.tf_lut)) * 1e3
    imgs[step], times[step] = img, ms
    # matching t-step golden (the reference's quadrature)
    pt = RenderParams(raymarching_step_size=step, max_steps=None, **BASE)
    g = jax.jit(
        lambda v, l, pt=pt: golden.render(
            Scene(v, scene.importance, l), m, pt, RES, RES
        )
    )
    gi = np.asarray(g(scene.volume, scene.tf_lut))
    d = np.abs(img - gi)
    print(
        f"step {step:.3f} -> planes {planes:4d}: slab-vs-tstep "
        f"max {d.max():.3e} mean {d.mean():.3e} | fwd {ms:6.2f} ms",
        flush=True,
    )

finest = imgs[steps[0]]
for step in steps[1:]:
    d = np.abs(imgs[step] - finest)
    print(
        f"slab internal: step {step:.3f} vs {steps[0]:.3f}: "
        f"max {d.max():.3e} mean {d.mean():.3e}",
        flush=True,
    )
