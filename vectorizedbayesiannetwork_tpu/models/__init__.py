"""CPD families (the ops/kernel layer of the framework)."""
from . import linear_gaussian  # noqa: F401
