"""CPD families — the framework's ops/kernel layer (SURVEY.md §2.2)."""
from . import linear_gaussian  # noqa: F401
from . import gaussian_nn  # noqa: F401
from . import mdn  # noqa: F401
from . import rff_gaussian  # noqa: F401
from . import categorical_table  # noqa: F401
from . import kde  # noqa: F401
from . import softmax_nn  # noqa: F401
from . import categorical_embedded_softmax  # noqa: F401
