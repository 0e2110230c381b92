from . import node_wise  # noqa: F401
