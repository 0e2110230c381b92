"""Optional plotting (parity: /root/reference/vbn/display/__init__.py:1-9)."""
from .figures import plot_cpd_fit, plot_inference_posterior, plot_sampling_outcome
from .plots import plots_enabled
