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


# ---------------------------------------------------------------------------
# Window-kernel data parallelism
# ---------------------------------------------------------------------------

def pack_windows_sharded(data_list, key_id, n_devices, seg_target=4096,
                         min_seg_len=64, max_seg_len=16384):
    """Window packing with a contig-aligned segment layout for sharding.

    Every contig gets the same number NS of segment slots (padded with
    invalid segments), and contigs are padded to a multiple of the mesh
    size, so slicing the segment axis by contig blocks keeps each contig
    entirely on one device.  Returns (keys (C*NS, L), valid, NS, C).
    """
    from ..ops.window_kernel import RESCALE_EVERY

    win = []
    for d in data_list:
        s = d[:, 0].astype(np.int64)
        k = np.array([key_id[tuple(r)] for r in d[:, 1:]], dtype=np.int32)
        win.append(np.repeat(k, s))
    C = len(win)
    pad_C = (-C) % n_devices
    win += [np.zeros(0, np.int32)] * pad_C
    C += pad_C
    W = max(1, sum(len(w) for w in win))
    L = int(2 ** np.ceil(np.log2(max(W / seg_target, 1.0))))
    L = int(np.clip(L, min_seg_len, max_seg_len))
    L = -(-L // RESCALE_EVERY) * RESCALE_EVERY
    NS = max(1, max(-(-len(w) // L) for w in win))
    keys = np.zeros((C * NS, L), dtype=np.int32)
    valid = np.zeros((C * NS, L), dtype=bool)
    for c, w in enumerate(win):
        for j in range(NS):
            seg = w[j * L : (j + 1) * L]
            if len(seg):
                keys[c * NS + j, : len(seg)] = seg
                valid[c * NS + j, : len(seg)] = True
    return keys, valid, NS, C


def make_sharded_window_estep(mesh, NS, C):
    """Contig-data-parallel window-kernel E-step via shard_map.

    Each device runs the window kernel on its local contigs' segments; the
    summed log-likelihood is psum'd, so grads of the replicated (pi, T, E)
    come out all-reduced automatically.
    """
    from jax.sharding import PartitionSpec as P
    from ..ops import window_kernel as wk

    n_dev = mesh.devices.size
    C_local = C // n_dev
    soc_local = np.arange(C_local * NS).reshape(C_local, NS)

    def local_ll(pi, T, E, keys, valid):
        ll = wk.loglik_windows(pi, T, E, keys, valid, soc_local)
        return jax.lax.psum(ll, "data")

    smapped = jax.shard_map(
        local_ll,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data", None), P("data", None)),
        out_specs=P(),
        check_vma=False,
    )

    def estep(pi, T, E, keys, valid):
        def total(pi, T, E):
            return smapped(pi, T, E, keys, valid)

        ll, grads = jax.value_and_grad(total, argnums=(0, 1, 2))(pi, T, E)
        return ll, pi * grads[0], T * grads[1], E * grads[2]

    return jax.jit(estep)
