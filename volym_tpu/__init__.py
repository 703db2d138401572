"""volym_tpu — a TPU-native differentiable importance-driven volume renderer.

A from-scratch JAX / Pallas / shard_map framework with the capabilities of
the reference interactive renderer (druskus20/volym, Rust + WGSL), redesigned
TPU-first: functional core, static-shape masked marching, Pallas kernels for
the hot forward/backward path, and ray-sharded multi-chip rendering with
overlapped gradient reduction.  See SURVEY.md for the layer map and the
reference file:line citations used throughout the docstrings.
"""

from volym_tpu.camera import Camera, CameraController, camera_matrices
from volym_tpu.config import BENCHMARK_PARAMS, Interpolation, RenderParams
from volym_tpu.scene import Scene
from volym_tpu.transfer_function import ControlPoint, TransferFunction

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "CameraController",
    "camera_matrices",
    "RenderParams",
    "BENCHMARK_PARAMS",
    "Interpolation",
    "Scene",
    "TransferFunction",
    "ControlPoint",
    "__version__",
]
