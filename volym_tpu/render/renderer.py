"""Top-level renderer factory — the "demo" layer.

The analog of the reference's ``ComputeDemo`` trait + ``BaseDemo`` plumbing
(``src/demos/mod.rs:9-17``, ``src/demos/pipeline.rs:113-226``): wire a scene
(bind groups -> pytree) and parameters (uniforms -> static config) into a
callable that renders frames for successive cameras.  "Updating GPU state"
per frame is just calling the jitted function with new camera matrices.
"""

from __future__ import annotations

from typing import Callable

from volym_tpu.config import RenderParams
from volym_tpu.scene import Scene


def make_renderer(
    scene: Scene,
    params: RenderParams,
    height: int,
    width: int,
    mesh=None,
    differentiable: bool = False,
    backend: str = "ray",
) -> Callable:
    """Returns ``render(camera_matrices) -> (H, W, 4) image``.

    ``mesh``: shard rays over a ``jax.sharding.Mesh`` (multi-chip);
    ``differentiable``: use the fixed-step custom-VJP march;
    ``backend``: "ray" = reference-parity t-step march (all modes);
    "slab" = jnp slab march; "slab_pallas" = the MXU hat-matmul kernel
    (fastest; base rendering modes).
    """
    if backend == "slab":
        from volym_tpu.render import slab

        march = slab.render_diff if differentiable else slab.render
        return lambda camera_matrices: march(scene, camera_matrices, params, height, width)
    if backend == "slab_pallas":
        import jax

        if jax.default_backend() != "tpu":
            # same off-TPU fallback as parallel/mesh.py and viewer.py: the
            # jnp slab golden implements identical semantics (incl. the
            # step-size -> plane-count mapping), so CLI flows stay
            # CPU-runnable
            from volym_tpu.render import slab

            march = slab.render_diff if differentiable else slab.render
            return lambda camera_matrices: march(
                scene, camera_matrices, params, height, width
            )
        from volym_tpu.ops import slab_kernel

        march = slab_kernel.render_diff if differentiable else slab_kernel.render
        return lambda camera_matrices: march(
            scene, camera_matrices, params, height, width
        )
    if backend != "ray":
        raise ValueError(f"unknown renderer backend: {backend}")

    if mesh is not None:
        from volym_tpu.parallel.mesh import render_sharded

        def render(camera_matrices):
            return render_sharded(
                scene, camera_matrices, params, height, width, mesh,
                differentiable=differentiable,
            )

        return render

    if differentiable:
        from volym_tpu.render import diff

        def render(camera_matrices):
            return diff.render(scene, camera_matrices, params, height, width)

        return render

    from volym_tpu.render import fast

    def render(camera_matrices):
        return fast.render(scene, camera_matrices, params, height, width)

    return render
