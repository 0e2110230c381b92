from . import monte_carlo_marginalization  # noqa: F401
from . import likelihood_weighting  # noqa: F401
from . import importance_sampling  # noqa: F401
