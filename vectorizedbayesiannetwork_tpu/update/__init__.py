from . import policies  # noqa: F401
from .base_update import BaseUpdatePolicy, resolve_node_update
