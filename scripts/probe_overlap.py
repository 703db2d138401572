"""Gradient-allreduce overlap evidence (VERDICT r3 item 4).

Compiles the sharded train step on the 8-virtual-device CPU mesh and
inspects the OPTIMIZED HLO schedule: where do the psum all-reduces sit
relative to the backward-march compute?  If every all-reduce were glued
to the end of the module, the reduction could never overlap compute; the
desired shape is reduce-scatter/all-reduce ops interleaved with (or
started before) trailing backward work, which XLA's latency-hiding
scheduler can then overlap on real ICI.  The CPU mesh shows the schedule
SHAPE (dependency placement); actual overlap ratios need multi-chip
hardware.

Also captures a jax.profiler trace of one sharded step for manual
inspection (written to /tmp/volym_overlap_trace).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
scripts/probe_overlap.py  (force-CPU handled in-process).
"""
import os
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from volym_tpu import Camera, RenderParams, Scene
from volym_tpu.parallel import mesh as pmesh

RES = 64
scene = Scene.synthetic("sphere", side=32)
cam = Camera(aspect=1.0, distance=1.1).orbit(20.0, 10.0, 0.0)
m = cam.matrices()
params = RenderParams(
    use_gaussian_smoothing=False,
    raymarching_step_size=1.0 / 32.0,
    use_shading=False,
    interpolation="trilinear",
    adaptive_stepping=False,
)
mesh = pmesh.make_mesh()
step = pmesh.make_train_step(
    params, RES, RES, mesh, backend="slab_pallas", camera_matrices=m
)
target = jnp.zeros((RES, RES, 4), jnp.float32)

lowered = jax.jit(lambda s, c, t: step(s, c, t)).lower(scene, m, target)
hlo = lowered.compile().as_text()
lines = hlo.splitlines()

# locate collective ops and heavy backward compute (dots) by line index
coll_idx = [
    i for i, l in enumerate(lines)
    if re.search(r"= .*(all-reduce|reduce-scatter|all-gather)\(", l)
]
dot_idx = [i for i, l in enumerate(lines) if re.search(r"= .*dot\(", l)]
n = len(lines)
print(f"HLO: {n} lines, {len(coll_idx)} collectives, {len(dot_idx)} dots")
if coll_idx and dot_idx:
    last_dot = max(dot_idx)
    before = sum(1 for i in coll_idx if i < last_dot)
    print(
        f"collectives before the last backward dot: {before}/{len(coll_idx)}"
        f" (first collective at line {min(coll_idx)}, last dot at {last_dot})"
    )
    for i in coll_idx[:8]:
        print("  ", lines[i].strip()[:110])

# one traced step for the record
with jax.profiler.trace("/tmp/volym_overlap_trace"):
    loss, grads = step(scene, m, target)
    jax.block_until_ready((loss, grads))
print("loss:", float(loss))
print("trace written to /tmp/volym_overlap_trace")
