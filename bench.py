"""Round benchmark: rays/s/chip forward+backward, bonsai 256^3 at 256x256.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

value        = rays/s of the production differentiable path: the Pallas
               slab-marching renderer (hat-matmul MXU sampling, zero
               gathers) with its two-pass Pallas backward — one fused
               value_and_grad step returning dL/dvoxel + dL/dTF.  Both
               directions are validated allclose against the CPU-runnable
               jnp slab golden (tests/test_slab.py,
               scripts/validate_slab_tpu.py).
vs_baseline  = value / rays/s of the naive baseline implementation
               (plain JAX autodiff through the reference-parity t-step
               lax.scan renderer, measured on the same chip at the SAME
               256x256 resolution) — the speedup of the TPU-native
               formulation over a direct translation of the reference's
               per-ray marching.

Config (BASELINE.json configs 1 + 4): bonsai-class 256^3 uint8 volume
(synthetic stand-in — the reference's raw blobs are stripped from the
mount), 256x256 rays, trilinear sampling, default TF, benchmark camera
preset (threshold 0.15, smoothing off — reference src/main.rs:180-190) at
the reference's effective orbit distance 1.0.  The slab march samples one
voxel-center plane per step along the dominant axis (the same
emission-absorption discretisation with per-ray constant step fed through
the reference's opacity correction, wgsl:314); the t-step baseline uses
fixed step 0.005.
"""

from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *, iters: int, warmup: int = 2) -> float:
    """Steady-state seconds/frame — the MARGINAL cost per dispatch, fenced
    by device->host fetches (``block_until_ready`` is not a reliable fence
    on the axon platform).  One canonical implementation:
    :func:`volym_tpu.bench.harness.marginal_time`."""
    from volym_tpu.bench.harness import marginal_time

    return marginal_time(fn, iters=iters, warmup=warmup)


def probe_device_liveness(timeout_s: float = 120.0, attempts: int = 3) -> bool:
    """Return True iff ``jax.devices()`` responds within ``timeout_s``.

    The experimental axon TPU tunnel can wedge hard: a hung kernel keeps
    the chip claimed and every new client blocks FOREVER inside PJRT
    client creation (no timeout knob is honored).  Probing in a throwaway
    subprocess keeps this process unwedged so it can fall back to CPU and
    still print its one JSON line instead of hanging the driver."""
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return True
    code = "import jax; jax.devices(); print('ok')"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s,
                capture_output=True,
                text=True,
            )
            if r.returncode == 0 and "ok" in r.stdout:
                return True
            log(f"liveness probe {i+1}/{attempts}: rc={r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"liveness probe {i+1}/{attempts}: timed out after {timeout_s:.0f}s")
        time.sleep(10.0)
    return False


def main() -> int:
    import os

    cpu_fallback = False
    if not probe_device_liveness():
        # the accelerator is unreachable (wedged tunnel) — measure the same
        # protocol on CPU rather than hang; the JSON says so explicitly.
        log("device unreachable; falling back to JAX_PLATFORMS=cpu")
        os.environ["JAX_PLATFORMS"] = "cpu"
        cpu_fallback = True

    import jax

    if cpu_fallback:
        # the env var alone is not enough: the axon plugin's register()
        # hook (sitecustomize) forces jax_platforms='axon,cpu', and
        # initialising the axon backend blocks forever on a wedged
        # terminal.  An explicit config update wins as long as no backend
        # has been initialised (same pattern as tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from volym_tpu import Camera, RenderParams, Scene
    from volym_tpu.render import golden

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    on_tpu = dev.platform == "tpu"

    # production and baseline measured at the SAME resolution (the t-step
    # autodiff baseline is ~5 s/frame at 256^2 — 2 timed iters suffice;
    # its frame time scales linearly in rays, verified vs 128^2)
    height = width = 256 if on_tpu else 64
    base_h = base_w = 256 if on_tpu else 32
    iters = 30 if on_tpu else 2
    base_iters = 2 if on_tpu else 1

    params = RenderParams(
        density_threshold=0.15,
        raymarching_step_size=0.005 if on_tpu else 0.02,
        use_gaussian_smoothing=False,
        interpolation="trilinear",
        adaptive_stepping=False,
        use_shading=False,
        # the benchmark loss differentiates volume + TF only (BASELINE.json
        # config 4); skip the camera-cotangent chains in the Pallas backward
        # (d volume / d TF bit-identical — tests/test_slab.py).  The t-step
        # baseline below likewise computes no camera grads (camera matrices
        # are closed over, grad is w.r.t. the scene pytree).
        camera_grads=False,
        # integer-exact bf16 streaming: the synthetic bonsai is u8-origin
        # (Scene.from_uint8), exactly like the reference's uint8 raws —
        # single-pass density matmuls at half the slice DMA
        # (tests/test_u8_stream.py pins the path against the f32 kernels)
        u8_volume=True,
    )
    scene = Scene.synthetic("bonsai", side=256 if on_tpu else 64)
    cam = Camera(aspect=1.0, distance=1.0).orbit(30.0, 20.0, 0.0)
    m = cam.matrices()

    # --- production path: Pallas slab fwd + two-pass Pallas bwd --------
    if on_tpu:
        from volym_tpu.ops import slab_kernel as prod_mod
    else:
        from volym_tpu.render import slab as prod_mod  # jnp slab (no interpret)

    def loss_prod(vol, lut):
        img = prod_mod.render_diff(
            Scene(vol, scene.importance, lut), m, params, height, width
        )
        return jnp.sum(img)

    prod_step = jax.jit(jax.value_and_grad(loss_prod, argnums=(0, 1)))

    def prod():
        return prod_step(scene.volume, scene.tf_lut)

    t_prod = timeit(prod, iters=iters)
    rays_prod = height * width / t_prod
    log(f"production fwd+bwd: {t_prod*1e3:.1f} ms/frame -> {rays_prod:,.0f} rays/s")

    # --- baseline: plain autodiff through the golden scan --------------
    def loss_base(s):
        img = golden.render(s, m, params, base_h, base_w)
        return jnp.sum(img)

    base_step = jax.jit(jax.value_and_grad(loss_base))

    def base():
        return base_step(scene)

    t_base = timeit(base, iters=base_iters, warmup=1)
    rays_base = base_h * base_w / t_base
    log(f"baseline  fwd+bwd: {t_base*1e3:.1f} ms/frame -> {rays_base:,.0f} rays/s")

    result = {
        "metric": "rays_per_s_chip_fwd_bwd_bonsai256_256x256",
        "value": round(rays_prod, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_prod / rays_base, 3),
    }
    if on_tpu:
        # self-describing knob set: which kernel configuration produced
        # this number (platform variance is ±20% across sessions; without
        # this a reader can mistake variance for a knob and vice versa)
        result["knobs"] = {
            "exact_dot": prod_mod.EXACT_DOT,
            "store_density": prod_mod.STORE_DENSITY,
            "win_cols": prod_mod.WIN_COLS,
            "tile": prod_mod.TILE,
            "slab_batch": prod_mod.SLAB_BATCH,
            "fast_math": params.fast_math,
            "camera_grads": params.camera_grads,
            "u8_volume": params.u8_volume,
            "subtexel_bits": params.subtexel_bits,
            "prod_ms_per_frame": round(t_prod * 1e3, 2),
            "baseline_ms_per_frame": round(t_base * 1e3, 1),
        }
    if cpu_fallback:
        result["metric"] += "_CPU_FALLBACK_tpu_unreachable"
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
