"""tpu_raytracing — a TPU-native ray-tracing framework (JAX / XLA / Pallas).

Built from scratch with the capabilities of the CUDA reference
(gregc-91/GPU-Raytracing): on-device BVH construction (LBVH, binned-SAH over a
scene-grid decomposition, hybrid), triangle pairing and spatial splits, a
wavefront tracer with nine render modes, and a full OBJ/MTL/texture scene
pipeline. The architecture is idiomatic TPU — SoA pytrees, statically shaped
frontier loops, Pallas kernels for the hot ops, shard_map for multi-chip —
not a port of the reference's CUDA patterns.
"""

__version__ = "0.1.0"

from tpu_raytracing.bvh.types import BVH, TrianglePairs  # noqa: F401
from tpu_raytracing.scene.types import DeviceScene, Library, Scene  # noqa: F401
