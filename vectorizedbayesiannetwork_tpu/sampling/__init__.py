from . import ancestral  # noqa: F401
