"""Multi-chip data parallelism over contigs.

The reference's only scaling axis is OpenMP threads over per-contig HMMs
(src/inference_manager.cpp:89-106).  The TPU-native equivalent: a
``('data',)`` device mesh; the padded (C, L) span/key arrays are sharded on
the contig axis, pi/T/E are replicated, and the E-step sufficient statistics
(which are gradients of the summed log-likelihood w.r.t. the replicated
tensors) are all-reduced by XLA automatically — the psum falls out of
differentiating a sharded-sum loss w.r.t. replicated inputs.

Multi-host execution uses the same code path after ``jax.distributed``
initialization: jax.jit global arrays span hosts transparently.
"""

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import hmm


def make_mesh(devices=None):
    "1-D ('data',) mesh over the given (default: all) devices."
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(mesh, spans, keys):
    """Pad the contig axis to a multiple of the mesh size and place the
    arrays with contig-sharded layout."""
    n = mesh.devices.size
    C = spans.shape[0]
    pad = (-C) % n
    if pad:
        spans = np.concatenate(
            [spans, np.zeros((pad, spans.shape[1]), spans.dtype)]
        )
        keys = np.concatenate(
            [keys, np.zeros((pad, keys.shape[1]), keys.dtype)]
        )
    sh = NamedSharding(mesh, P("data", None))
    return jax.device_put(spans, sh), jax.device_put(keys, sh)


def make_sharded_estep(mesh, nbits, chunk):
    """Jitted E-step with contig-data-parallel sharding.

    Returns f(pi, T, E, spans, keys) -> (ll, gamma0, xisum, gamma_sums),
    everything replicated on output.
    """
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data", None))
    return jax.jit(
        partial(hmm.estep, nbits=nbits, chunk=chunk),
        in_shardings=(repl, repl, repl, data_sh, data_sh),
        out_shardings=(repl, repl, repl, repl),
    )


def make_sharded_loglik(mesh, nbits, chunk):
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data", None))
    return jax.jit(
        partial(hmm.loglik, nbits=nbits, chunk=chunk),
        in_shardings=(repl, repl, repl, data_sh, data_sh),
        out_shardings=repl,
    )
