"""Render parameter configuration.

TPU-native analog of the reference's three-tier parameter system
(``src/state.rs:28-55`` StateParameters defaults, ``src/cli.rs`` CLI flags,
``src/gpu_resources/parameters.rs:55-83`` GPU uniform mirror).  Here a single
frozen dataclass is the whole story: parameters are hashable static config for
``jax.jit`` (bools/ints select traced branches at compile time) while the
*float* knobs that we want to sweep without recompiling travel as a small
jnp array (see :meth:`RenderParams.dynamic`).
"""

from __future__ import annotations

import dataclasses
import enum
import math
from dataclasses import dataclass

import jax.numpy as jnp


class Interpolation(str, enum.Enum):
    """Volume sampling filter.

    The reference samples the density volume with wgpu's *default* sampler,
    which is nearest-neighbour (``src/gpu_resources/volume.rs:96-99`` uses
    ``SamplerDescriptor::default()``), and the importance volume with an
    explicit nearest sampler (``src/demos/simple/importance.rs:122-131``).
    ``TRILINEAR`` is the differentiable upgrade demanded by BASELINE.json
    config 2 (camera gradients require a filter that is continuous in the
    sample position).
    """

    NEAREST = "nearest"
    TRILINEAR = "trilinear"


@dataclass(frozen=True)
class RenderParams:
    """All tunable render parameters.

    Field-for-field superset of the reference's ``StateParameters``
    (``src/state.rs:28-55``; canonical names from the GPU uniform block
    ``src/gpu_resources/parameters.rs:57-66``).  Defaults match
    ``StateParameters::default()`` (``src/state.rs:41-55``).
    """

    density_threshold: float = 0.12
    use_cone_importance_check: bool = False
    use_importance_coloring: bool = False
    use_opacity: bool = True
    use_importance_rendering: bool = False
    use_gaussian_smoothing: bool = True
    importance_check_ahead_steps: int = 12
    raymarching_step_size: float = 0.010

    # --- TPU-side extensions (no reference counterpart) ---
    interpolation: Interpolation = Interpolation.NEAREST
    #: Adaptive stepping (reference ``wgsl:243-269``): quarter step inside
    #: dense regions, x1.5 recovery.  Forward-only optimisation; the
    #: differentiable path uses fixed steps (SURVEY.md section 7).
    adaptive_stepping: bool = True
    #: Front-to-back early-out threshold (reference ``wgsl:250``).
    early_termination_alpha: float = 0.95
    #: Static upper bound on march iterations.  ``None`` derives the worst
    #: case from the step size (diagonal of the unit box / min step).
    max_steps: int | None = None
    #: Use Blinn-Phong shading (always on in the reference kernel
    #: ``wgsl:306-311``; toggleable here because the differentiable
    #: inverse-rendering objective usually wants the unshaded integral).
    use_shading: bool = True
    #: Slab-kernel fast-math v2: the density contraction (and hence the
    #: threshold mask) always runs EXACT; the auxiliary matmuls (shading
    #: gradient field, importance) drop to DEFAULT (bf16-class) MXU
    #: precision.  Image error is bounded ~1e-3 (no mask flips), unlike
    #: the v1 preview mode that also quantised the density.  The BACKWARD
    #: inherits the same contract: the replay's density contraction stays
    #: exact (mask integrity) while the voxel/LUT/grad-field scatters and
    #: camera dhat chains run at DEFAULT — ~1.27x faster scene-grad steps.
    #: Gradient noise is direction-preserving (cos(d_vol, exact) >= 0.994;
    #: median rel err 0.5% on significant voxels) but heavy-tailed on
    #: cancellation-dominated voxels (p99 ~0.6 rel), so Adam fitting
    #: converges indistinguishably (measured, scripts/probe_fm_bwd.py)
    #: while pointwise gradient values are NOT suitable for e.g.
    #: finite-difference validation.  Default False = fully exact.
    fast_math: bool = False
    #: Subtexel precision of the slab-path VOLUME samplers, in fractional
    #: bits of the sample coordinate.  GPU texture units filter at
    #: fixed-point subtexel precision (D3D mandates exactly 8 fractional
    #: bits; Vulkan >= 4), so 8 reproduces what the reference's wgpu
    #: sampler actually computes — and it makes every volume hat weight an
    #: exact multiple of 2^-8, which is exactly bf16-representable: the
    #: kernels' HIGHEST-precision MXU contractions then drop from 3 bf16
    #: passes to 2 (``slab_kernel.kernel_dot(exact=...)``) at the SAME
    #: ~2^-18 error bound.  The jnp slab golden and the replay VJPs
    #: quantize identically (straight-through for gradients) from
    #: bit-identical shared affine coordinates (``slab.ray_affine``), so
    #: all slab-path validations remain exact-by-construction.  The 1D TF
    #: coordinate is deliberately NOT snapped: it depends on the computed
    #: density, which differs between kernel and golden at ~1e-5 — a snap
    #: there would quantize the two sides to different texels at boundary
    #: bands (see ``slab_kernel._tf_lookup``).  0 = full-f32 sample
    #: coordinates (round-2 semantics; ~1.3x slower exact contractions).
    #: The t-step renderers ignore this (they keep f32 coordinates).
    subtexel_bits: int = 8
    #: Emit camera-pose cotangents (d feats) from the Pallas backward.
    #: The scene-fitting loops optimise only volume/TF, and skipping the
    #: dhat matmul chains cuts the replay pass substantially; with False
    #: the differentiable renderers return exact d volume / d TF / d
    #: importance but SILENTLY ZERO camera-matrix gradients — leave True
    #: for pose optimisation.
    camera_grads: bool = True
    #: Integer-exact streaming for u8-origin volumes (the reference's
    #: datasets are uint8 raws, ``src/demos/simple/mod.rs:40-55``).  The
    #: slab kernels then stream the density grid as bf16 holding the RAW
    #: 0..255 integers (2 bytes/voxel — half the slice DMA) and run the
    #: density sampling matmul SINGLE-pass: u8 integers and subtexel-
    #: snapped hat weights are both exactly bf16-representable, so the
    #: bf16 products accumulate exactly in the MXU's f32 accumulator —
    #: fewer passes than the split-exact f32 path at BETTER accuracy (the
    #: integer dot is exact; only the final 1/255-scale entries round).
    #: The march runs in the scaled density domain: threshold knob x255,
    #: TF coordinate scale ln/255 — mask/LUT semantics preserved to f32
    #: rounding class (knife-edge pixels only vs the f32 path).
    #: CONTRACT: the volume must be exactly u8-representable
    #: (``round(v*255)/255 == v``); the flag is auto-set by the CLI for
    #: u8 raw sources and silently ignored (f32 path) under camera
    #: cotangents or a resampled slab ladder.  Gaussian smoothing runs
    #: in the scaled domain (linear stencil, scale-invariant
    #: normalisation) and keeps the u8 stream.
    u8_volume: bool = False

    def __post_init__(self):
        if not isinstance(self.interpolation, Interpolation):
            object.__setattr__(self, "interpolation", Interpolation(self.interpolation))
        if not 0 <= int(self.subtexel_bits) <= 8:
            # > 8 breaks the kernels' exact-contraction contract: snapped
            # hat weights k/2^bits stop being bf16-representable (bf16 has
            # an 8-bit significand), so kernel_dot's 2-pass exact= path
            # would silently drop the hats' low bits — the documented
            # "wrong hint" failure — corrupting renders AND the
            # exact-by-construction validation story.
            raise ValueError(
                f"subtexel_bits must be in [0, 8], got {self.subtexel_bits}"
            )

    # ------------------------------------------------------------------
    @property
    def min_step_size(self) -> float:
        """Reference ``wgsl:244``: min step is a quarter of the base step."""
        return self.raymarching_step_size * 0.25

    def resolved_max_steps(self) -> int:
        """Worst-case march iterations through the unit box.

        Every iteration advances ``t`` by at least the minimum step size
        (adaptive) or the base step (fixed), so the diagonal sqrt(3) bounds
        the trip count.
        """
        if self.max_steps is not None:
            return int(self.max_steps)
        step = self.min_step_size if self.adaptive_stepping else self.raymarching_step_size
        return int(math.sqrt(3.0) / step) + 2

    # ------------------------------------------------------------------
    # Split into jit-static and traced parts so float sweeps don't recompile.
    DYNAMIC_FIELDS = (
        "density_threshold",
        "raymarching_step_size",
        "early_termination_alpha",
        "importance_check_ahead_steps",
    )

    def dynamic(self) -> jnp.ndarray:
        """The float knobs as a traced vector (uniform-buffer analog)."""
        return jnp.array(
            [float(getattr(self, f)) for f in self.DYNAMIC_FIELDS],
            dtype=jnp.float32,
        )

    def split_dynamic(self) -> tuple["RenderParams", jnp.ndarray]:
        """(jit-static params, traced knob vector) — the per-frame uniform
        update (``src/gpu_resources/parameters.rs:68-83``): every float the
        reference GUI mutates live travels traced, so threshold / step-size
        / early-alpha / ahead-steps sweeps reuse ONE compilation per flag
        combination.  The static copy zeroes those fields; code holding it
        must take the values from the vector (``resolved_max_steps`` is not
        meaningful on the static copy unless ``max_steps`` is set)."""
        if self.importance_check_ahead_steps > 25:
            # the traced look-ahead probes a static 25-iteration cap
            # (render/golden.py AHEAD_CAP — the reference GUI slider max,
            # src/gui.rs:239) and masks unused probes; a larger traced
            # value would silently probe only the first 25/K of the range
            raise ValueError(
                "importance_check_ahead_steps > 25 cannot travel as a "
                "traced knob (AHEAD_CAP); use the static-params renderers"
            )
        static = self.replace(
            density_threshold=0.0,
            raymarching_step_size=0.0,
            early_termination_alpha=0.0,
            importance_check_ahead_steps=0,
        )
        return static, self.dynamic()

    def replace(self, **kw) -> "RenderParams":
        return dataclasses.replace(self, **kw)

    def slab_static(self) -> "RenderParams":
        """Canonical jit key for the slab renderers: fields the slab march
        never reads (t-step size, probe count, adaptive stepping, max
        steps) are zeroed so parameter sweeps over them reuse one
        compilation.  The jnp slab golden reads the float knobs off this
        key; the production Pallas path uses :meth:`pallas_static` +
        :meth:`knobs` instead (floats traced, zero recompiles)."""
        return self.replace(
            raymarching_step_size=0.0,
            importance_check_ahead_steps=0,
            adaptive_stepping=False,
            max_steps=None,
        )

    def pallas_static(self) -> "RenderParams":
        """Jit key for the Pallas slab kernels: :meth:`slab_static` plus
        the float knobs the kernels read as traced SMEM scalars (density
        threshold, early-termination alpha) zeroed out of the key — the
        per-frame uniform update (``src/gpu_resources/parameters.rs:68-83``):
        a slider drag re-renders with ZERO recompiles."""
        return self.slab_static().replace(
            density_threshold=0.0,
            early_termination_alpha=0.0,
        )

    def knobs(self) -> jnp.ndarray:
        """(1, 2) traced [density_threshold, early_termination_alpha] for
        the slab-path kernels (SMEM scalars in Pallas)."""
        return jnp.array(
            [[float(self.density_threshold),
              float(self.early_termination_alpha)]],
            dtype=jnp.float32,
        )


#: Benchmark parameter preset (reference ``src/main.rs:180-190``).
BENCHMARK_PARAMS = RenderParams(
    density_threshold=0.15,
    use_opacity=True,
    use_cone_importance_check=False,
    use_importance_coloring=False,
    use_importance_rendering=False,
    use_gaussian_smoothing=False,
    importance_check_ahead_steps=15,
    raymarching_step_size=0.020,
)
