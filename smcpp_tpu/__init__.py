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

import os as _os

from jax import config as _config

# Double precision for all model-dependent setup math (rate function,
# transition, CSFS, M-step).  The E-step hot path casts to float32 explicitly
# (matching the reference's float32 forward pass, /root/reference/include/hmm.h:35).
_config.update("jax_enable_x64", True)

# Persistent compilation cache: an `estimate` run compiles several large
# programs (E-step kernels, the M-step Q family); caching them on disk
# makes repeat runs (CV folds, re-fits, parameter sweeps) start in
# seconds (measured 33.5 -> 18.1 s on the bundled example).  Enabled by
# default on CPU backends only.  Measured on the remote-compile TPU
# plugin (round 3): executable serialization WORKS (entries written,
# results correct) but the warm-cache run was ~4x SLOWER than recompiling
# (783 s vs 201 s for a small estimate) — deserializing executables back
# through the remote-compile tunnel costs more than compilation, so the
# cache stays off there.  Set SMCPP_TPU_COMPILE_CACHE=<dir> (or =1) to
# force it on, =0 to disable.
_cache = _os.environ.get("SMCPP_TPU_COMPILE_CACHE")
if _cache is None:
    _plat = _os.environ.get("JAX_PLATFORMS", "")
    _cache = "1" if _plat.split(",")[0] in ("cpu", "") else "0"
if _cache != "0":
    if _cache == "1":
        _cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", "smcpp_tpu", "jax_cache"
        )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _config.update("jax_compilation_cache_dir", _cache)
        _config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # cache EVERYTHING: a tiny estimate issues ~55 compiles averaging
        # ~0.2 s each, so the default 0.5 s floor left ~10 s of compiles
        # uncached on every run (measured: warm C1 wall 19.0 -> 15.5 s
        # with the floor at 0)
        _config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except (OSError, AttributeError):  # read-only FS / older jax
        pass

from .version import __version__  # noqa: E402,F401
