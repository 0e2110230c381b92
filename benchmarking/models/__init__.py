from .base import BaseBenchmarkModel
from .config import ComponentSpec, ModelBenchmarkConfig
from .registry import MODEL_REGISTRY, register_model
from . import vbn_tpu  # noqa: F401
from . import reference_vbn  # noqa: F401
from . import exact_oracle  # noqa: F401
