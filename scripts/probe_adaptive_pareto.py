"""Adaptive-stepping Pareto: settle VERDICT r4 item 6 ("implement or
dominate").

The reference kernel refines its t-step to 1/4 inside dense regions
(``wgsl:262-269``) — an accuracy/speed trade on the t-step march.  The
slab path's equivalent knob is the GLOBAL plane-count ladder
(``slab.slab_resample``).  This probe measures the actual Pareto frontier
on the chip: frame time vs quadrature error against a common fine
reference (the t-step march at the reference's own refined step,
base/4 everywhere — the integral the adaptive march approximates), for

  - the t-step march, fixed base step          (reference w/o adaptive)
  - the t-step march, ADAPTIVE (1/4 in dense)  (the reference feature)
  - the slab march at 256 / 512 / 1024 planes  (the TPU-native ladder)

If a ladder point is simultaneously faster AND closer to the reference
integral than the adaptive t-step march, the ladder dominates: per-ray
adaptive refinement would add per-step branching (measured ~0.25 us per
step-branch in this kernel, BASELINE.md round-3 negatives) to buy
accuracy the ladder already exceeds at lower cost.

Run: python scripts/probe_adaptive_pareto.py   (needs the TPU; ~5 min)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.bench.harness import marginal_time
from volym_tpu.ops import slab_kernel as sk
from volym_tpu.render import fast

RES = 256
BASE_STEP = 0.005
scene = Scene.synthetic("bonsai", side=256)
m = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0).matrices()
base = RenderParams(
    density_threshold=0.15,
    raymarching_step_size=BASE_STEP,
    use_gaussian_smoothing=False,
    interpolation="trilinear",
    use_shading=False,
    camera_grads=False,
    u8_volume=True,
)

# common reference: t-step march at the refined step EVERYWHERE (the
# integral the reference's adaptive march approximates from above)
ref_p = base.replace(
    raymarching_step_size=BASE_STEP / 4.0, adaptive_stepping=False
)
ref = np.asarray(fast.render(scene, m, ref_p, RES, RES))
print("reference: t-step march @ step", BASE_STEP / 4.0, flush=True)

rows = []


def row(name, img, t_ms):
    err = float(np.abs(np.asarray(img) - ref).mean())
    rows.append((name, t_ms, err))
    print(f"{name:42s}: {t_ms:8.2f} ms  mean|d| {err:.2e}", flush=True)


for name, p in (
    ("t-step fixed @base step", base.replace(adaptive_stepping=False)),
    ("t-step ADAPTIVE (1/4 in dense, wgsl:262)", base.replace(adaptive_stepping=True)),
):
    img = fast.render(scene, m, p, RES, RES)
    t = marginal_time(lambda p=p: fast.render(scene, m, p, RES, RES), iters=8)
    row(name, img, t * 1e3)

for planes_step, label in (
    (BASE_STEP, "slab ladder 256 planes (@base step)"),
    (BASE_STEP / 2.0, "slab ladder 512 planes"),
    (BASE_STEP / 4.0, "slab ladder 1024 planes (@refined step)"),
):
    p = base.replace(
        raymarching_step_size=planes_step, adaptive_stepping=False
    )
    img = sk.render(scene, m, p, RES, RES)
    t = marginal_time(lambda p=p: sk.render(scene, m, p, RES, RES), iters=12)
    row(label, img, t * 1e3)

# domination check: slab@refined vs t-step adaptive
t_ad = next(t for n, t, _ in rows if "ADAPTIVE" in n)
e_ad = next(e for n, _, e in rows if "ADAPTIVE" in n)
t_sl = next(t for n, t, _ in rows if "1024" in n)
e_sl = next(e for n, _, e in rows if "1024" in n)
dom = t_sl < t_ad and e_sl < e_ad
print(
    f"\nslab@1024 vs t-step adaptive: {t_sl:.1f} vs {t_ad:.1f} ms, "
    f"err {e_sl:.2e} vs {e_ad:.2e} -> "
    + ("DOMINATES (faster AND closer to the reference integral)" if dom
       else "does not dominate")
)
sys.exit(0 if dom else 1)
