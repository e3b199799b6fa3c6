"""lshrs_tpu — TPU-native banded random-projection LSH index & query engine.

A brand-new JAX/XLA/Pallas implementation of the capability set of the
``lshrs`` library (Redis-backed LSH for approximate nearest-neighbor
search): batched MXU signature hashing, an HBM-resident signature store
with fused collision-count/top-k query kernels, cosine reranking against a
device-resident payload, streaming ingestion, band/row auto-tuning,
persistence, and mesh-sharded scale-out.
"""

from typing import Final

from lshrs_tpu.core.main import LSHRS, lshrs
from lshrs_tpu.storage import BaseStorage, DeviceStore, IdFilter, MemoryStorage

__version__: Final[str] = "0.1.0"

# Fail fast when hard dependencies are missing.
_hard_dependencies = ("numpy", "jax")
for _dependency in _hard_dependencies:
    try:
        __import__(_dependency)
    except ImportError as _e:  # pragma: no cover
        raise ImportError(
            f"Unable to import required dependency {_dependency}. "
            "Please see the traceback for details."
        ) from _e
del _hard_dependencies, _dependency

__all__ = [
    "LSHRS",
    "lshrs",
    "BaseStorage",
    "DeviceStore",
    "IdFilter",
    "MemoryStorage",
    "__version__",
]
