"""vectorizedbayesiannetwork_tpu — TPU-native vectorized Bayesian networks.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference VBN library (``/root/reference``): pluggable CPD families over a
static DAG, node-wise learning, batched Monte-Carlo posterior inference,
ancestral/Gibbs/HMC sampling, and online update policies — all vectorized
over ``[batch, particle, dim]`` and shardable over a TPU device mesh.

Importing this package populates the component registries (parity:
``vbn/__init__.py:1-44``).
"""

from .core.cache import enable_compilation_cache

# Persistent XLA compilation cache: a second process serving the same
# network skips every multi-second compile (VBN_COMPILATION_CACHE=0 to
# disable; see core/cache.py).
enable_compilation_cache()

from .core.base import BaseCPD, CPDOutput, Query
from .core.dag import DynamicDAG, StaticDAG, TemporalDAG
from .core.handle import CPDHandle
from .core.registry import (
    CPD_REGISTRY,
    INFERENCE_REGISTRY,
    LEARNING_REGISTRY,
    SAMPLING_REGISTRY,
    UPDATE_REGISTRY,
    register_cpd,
    register_inference,
    register_learning,
    register_sampling,
    register_update,
)
from .defaults import defaults

# Populate registries.
from . import models  # noqa: F401  (CPD families)
from . import learning  # noqa: F401
from . import inference  # noqa: F401
from . import sampling  # noqa: F401
from . import update  # noqa: F401

from .vbn import VBN, ConfigItem, ConfigNamespace, __version__

__all__ = [
    "VBN",
    "Query",
    "BaseCPD",
    "CPDOutput",
    "CPDHandle",
    "StaticDAG",
    "TemporalDAG",
    "DynamicDAG",
    "ConfigItem",
    "ConfigNamespace",
    "defaults",
    "CPD_REGISTRY",
    "LEARNING_REGISTRY",
    "INFERENCE_REGISTRY",
    "SAMPLING_REGISTRY",
    "UPDATE_REGISTRY",
    "register_cpd",
    "register_learning",
    "register_inference",
    "register_sampling",
    "register_update",
    "__version__",
]
