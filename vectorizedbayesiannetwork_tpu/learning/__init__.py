from . import amortized, node_wise  # noqa: F401
