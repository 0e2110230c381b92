from .base import BaseCPD, CPDOutput, Query
from .dag import DynamicDAG, StaticDAG, TemporalDAG
from .handle import CPDHandle
from .plan import InferencePlan, build_plan, get_plan, pack_fixed_values
from .registry import (
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
from .rng import KeyStream, fold, root_key
