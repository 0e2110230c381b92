from .gauss import (
    diag_gaussian_log_prob,
    gaussian_log_prob,
    normalize_probs,
    safe_softplus,
    stable_log,
)
