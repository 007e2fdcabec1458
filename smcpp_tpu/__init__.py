"""smcpp_tpu — a TPU-native reimplementation of the SMC++ method.

Estimates effective population-size history N(t) from whole-genome sequence
data with an EM-fitted hidden Markov model along the genome, following the
method of Terhorst, Kamm & Song (Nature Genetics 2017).  The numerical core is
pure JAX/XLA: the E-step forward pass runs as batched matrix products on the
TPU MXU with all sufficient statistics recovered through ``jax.grad`` of the
log-likelihood, and the M-step objective Q(theta) is differentiated end-to-end
through the rate function, transition matrix and conditioned-SFS emissions.

Reference behavior: popgenmethods/smcpp (see SURVEY.md for the layer map).
"""

from jax import config as _config

# Double precision for all model-dependent setup math (rate function,
# transition, CSFS, M-step).  The E-step hot path casts to float32 explicitly
# (matching the reference's float32 forward pass, /root/reference/include/hmm.h:35).
_config.update("jax_enable_x64", True)

from .version import __version__  # noqa: E402,F401
