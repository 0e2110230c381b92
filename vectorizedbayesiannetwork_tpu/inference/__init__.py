from . import monte_carlo_marginalization  # noqa: F401
from . import likelihood_weighting  # noqa: F401
from . import importance_sampling  # noqa: F401
from . import resampled_importance_sampling  # noqa: F401
from . import lbp  # noqa: F401
from . import gaussian_exact  # noqa: F401
from . import categorical_exact  # noqa: F401
from . import rao_blackwellized_marginalization  # noqa: F401
