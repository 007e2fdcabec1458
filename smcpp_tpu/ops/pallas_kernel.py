"""Pallas TPU kernel for the window-lockstep E-step forward/backward.

STATUS: correct (forward bit-exact vs the XLA kernel on TPU; backward within
f32 tolerance) but currently ~15% slower than the one-hot XLA window kernel
at human scale: the 8x block-diagonal padding waste cancels the VMEM-residency
win, and XLA's default-precision matmuls use faster bf16 passes.  Kept as an
alternative backend and the substrate for future bf16/waste-free packing;
ops/window_kernel.py remains the default E-step path.

Improves on the XLA window kernel (ops/window_kernel.py) in two ways:

1. **MXU packing**: P = 128 // M copies of T^T are packed into one
   block-diagonal (128, 128) operand, so each step is a native
   (128, 128) @ (128, M*128) matmul instead of an M=16-contraction that
   uses 1/64 of the systolic array.
2. **VMEM residency**: the state X for a tile of TS segments stays in VMEM
   for a whole RESCALE_EVERY-step block (one pallas call per block), cutting
   HBM traffic by ~2*B vs. the per-step XLA schedule.

The block is exposed through ``jax.custom_vjp``; the backward kernel
recomputes the block's intermediate states in VMEM and emits cotangents for
(X_in, Tblk, E).  The rescale epilogue backpropagates as dX/m exactly
*because the downstream consumer is scale-invariant* — the chunk scan
combines (ops, logs) only through exp(logs) * ops, so the Euler identity
sum_j Xout_j dL/dXout_j == dL/dlogs makes the dm terms cancel.  (The 1e-35
floor breaks this by a measure-zero amount, matching the reference's own
hard alpha floor, hmm.cpp:92-94.)

Mosaic-friendly layout rules: the minor (lane) dimension is always
TSP = 128, reshapes only split/merge major dimensions, and every
contraction is a ``dot_general`` with explicit dimension numbers (no
transposes of the lane dim).

Per tile: TS = P * TSP segments; X4 view (P, M, M, TSP) indexed
(g, out_state, in_state, s8); segment s = tile*TS + s8*P + g.  Padding
segments carry the sentinel key n_keys and are skipped by the validity
select.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_kernel import FLOOR, RESCALE_EVERY

LANES = 128
TSP = 128  # segments per packing group (= lane width)


def _supported(M, n_keys):
    return LANES % M == 0 and n_keys + 1 <= 512


def _dot(a, b, contract_a, contract_b):
    return jax.lax.dot_general(
        a, b, ((contract_a, contract_b), ((), ())),
        preferred_element_type=a.dtype,
    )


def _e_oh(E_full, k2):
    """k2 (P, TSP) int -> (one-hot (P, TSP, nk1), e_pmt (P, M, TSP))."""
    nk1 = E_full.shape[0]
    P = k2.shape[0]
    oh = (
        k2[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (P, TSP, nk1), 2)
    ).astype(E_full.dtype)
    # e_mpt (M, P, TSP) = contract E (nk1, M) dim0 with oh dim2
    e_mpt = _dot(E_full, oh, (0,), (2,))
    return oh, jnp.swapaxes(e_mpt, 0, 1)  # (P, M, TSP)


def _fwd_step(Tblk, E_full, X, k2, n_keys, M, P):
    _, e_pmt = _e_oh(E_full, k2)
    vb = k2 < n_keys  # (P, TSP)
    G4 = _dot(Tblk, X, (1,), (0,)).reshape(P, M, M, TSP)
    H4 = jnp.maximum(G4 * e_pmt[:, :, None, :], FLOOR)
    X4 = jnp.where(vb[:, None, None, :], H4, X.reshape(P, M, M, TSP))
    return X4.reshape(LANES, M * TSP)


def _rescale_block(X, M, P):
    X4 = X.reshape(P, M, M, TSP)
    m = jnp.max(jnp.abs(X4), axis=(1, 2))  # (P, TSP)
    m = jnp.maximum(m, jnp.finfo(X.dtype).tiny)
    Xn = (X4 / m[:, None, None, :]).reshape(LANES, M * TSP)
    return Xn, m


def _fwd_kernel(Tblk_ref, E_ref, keys_ref, Xin_ref, logs_ref,
                Xout_ref, logsout_ref, *, B, n_keys, M, P):
    X = Xin_ref[0]
    Tblk = Tblk_ref[:]
    E_full = E_ref[:]
    for t in range(B):
        X = _fwd_step(Tblk, E_full, X, keys_ref[t, 0], n_keys, M, P)
    X, m = _rescale_block(X, M, P)
    Xout_ref[0] = X
    logsout_ref[0] = logs_ref[0] + jnp.log(m)


def _bwd_kernel(Tblk_ref, E_ref, keys_ref, Xin_ref, dXout_ref, dlogs_ref,
                dXin_ref, dT_ref, dE_ref, xs_scratch,
                *, B, n_keys, M, P):
    Tblk = Tblk_ref[:]
    E_full = E_ref[:]
    X = Xin_ref[0]
    for t in range(B):
        xs_scratch[t] = X
        X = _fwd_step(Tblk, E_full, X, keys_ref[t, 0], n_keys, M, P)
    _, m = _rescale_block(X, M, P)
    dX = (
        dXout_ref[0].reshape(P, M, M, TSP) / m[:, None, None, :]
    ).reshape(LANES, M * TSP)
    dT = jnp.zeros((LANES, LANES), X.dtype)
    dE = jnp.zeros(E_full.shape, X.dtype)
    for t in range(B - 1, -1, -1):
        Xt = xs_scratch[t]
        k2 = keys_ref[t, 0]
        oh, e_pmt = _e_oh(E_full, k2)
        vb = k2 < n_keys  # (P, TSP)
        G4 = _dot(Tblk, Xt, (1,), (0,)).reshape(P, M, M, TSP)
        H4 = G4 * e_pmt[:, :, None, :]
        Hmask4 = (H4 > FLOOR).astype(Xt.dtype)
        dXnext4 = dX.reshape(P, M, M, TSP)
        dH4 = jnp.where(vb[:, None, None, :], dXnext4, 0.0) * Hmask4
        dG4 = dH4 * e_pmt[:, :, None, :]
        # de_pmt[p, i, s8] = sum_k dH4[p, i, k, s8] * G4[p, i, k, s8]
        de_pmt = jnp.sum(dH4 * G4, axis=2)  # (P, M, TSP)
        # dE[n, m] = sum_{p, s8} oh[p, s8, n] * de_pmt[p, m, s8]
        # (Mosaic needs single contracting dims: unroll the small P axis)
        for p in range(P):
            dE = dE + _dot(oh[p], de_pmt[p], (0,), (1,))
        dG = dG4.reshape(LANES, M * TSP)
        # dT[a, b] = sum_c dG[a, c] * Xt[b, c]
        dT = dT + _dot(dG, Xt, (1,), (1,))
        # dX[b, c] = sum_a Tblk[a, b] * dG[a, c]
        dX = _dot(Tblk, dG, (0,), (0,))
        dX = (
            dX.reshape(P, M, M, TSP)
            + jnp.where(vb[:, None, None, :], 0.0, dXnext4)
        ).reshape(LANES, M * TSP)
    dXin_ref[0] = dX
    dT_ref[0] = dT
    dE_ref[0] = dE


# ---------------------------------------------------------------------------
# block function with custom VJP
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _block(Tblk, E_full, keys_blk, Xin, logs, n_keys, M, P):
    """One RESCALE_EVERY-step block over all tiles.

    Tblk (128, 128); E_full (nk+1, M); keys_blk (B, ntiles, P, TSP) int32;
    Xin (ntiles, 128, M*TSP); logs (ntiles, P, TSP).
    """
    B = keys_blk.shape[0]
    ntiles = Xin.shape[0]
    out = pl.pallas_call(
        partial(_fwd_kernel, B=B, n_keys=n_keys, M=M, P=P),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((LANES, LANES), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(E_full.shape, lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, P, TSP), lambda i: (i * 0, i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, M * TSP), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, TSP), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANES, M * TSP), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, TSP), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(Xin.shape, Xin.dtype),
            jax.ShapeDtypeStruct(logs.shape, logs.dtype),
        ],
    )(Tblk, E_full, keys_blk, Xin, logs)
    return out[0], out[1]


def _block_fwd(Tblk, E_full, keys_blk, Xin, logs, n_keys, M, P):
    out = _block(Tblk, E_full, keys_blk, Xin, logs, n_keys, M, P)
    return out, (Tblk, E_full, keys_blk, Xin)


def _block_bwd(n_keys, M, P, res, cot):
    Tblk, E_full, keys_blk, Xin = res
    dXout, dlogs = cot
    B = keys_blk.shape[0]
    ntiles = Xin.shape[0]
    dXin, dT_tiles, dE_tiles = pl.pallas_call(
        partial(_bwd_kernel, B=B, n_keys=n_keys, M=M, P=P),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((LANES, LANES), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(E_full.shape, lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, P, TSP), lambda i: (i * 0, i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, M * TSP), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, M * TSP), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, TSP), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANES, M * TSP), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, LANES), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + E_full.shape, lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(Xin.shape, Xin.dtype),
            jax.ShapeDtypeStruct((ntiles, LANES, LANES), Xin.dtype),
            jax.ShapeDtypeStruct((ntiles,) + E_full.shape, Xin.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, LANES, Xin.shape[-1]), Xin.dtype),
        ],
    )(Tblk, E_full, keys_blk, Xin, dXout, dlogs)
    dTblk = jnp.sum(dT_tiles, axis=0)
    dE = jnp.sum(dE_tiles, axis=0)
    return dTblk, dE, None, dXin, dlogs


_block.defvjp(_block_fwd, _block_bwd)


# ---------------------------------------------------------------------------
# packing helpers + public API (mirrors window_kernel.segment_operators)
# ---------------------------------------------------------------------------

def _pack_keys(keys, valid, n_keys, P):
    """(S, L) -> (nblk, B, ntiles, P, TSP) int32, jit-safe.

    Segment s = tile*TS + s8*P + g maps to [tile, g, s8]."""
    S, L = keys.shape
    TS = P * TSP
    k = jnp.where(valid, keys, n_keys).astype(jnp.int32)
    ntiles = -(-S // TS)
    pad_S = ntiles * TS - S
    if pad_S:
        k = jnp.concatenate([k, jnp.full((pad_S, L), n_keys, jnp.int32)])
    B = RESCALE_EVERY
    nblk = L // B
    # (S', L) -> (ntiles, TSP, P, nblk, B) -> (nblk, B, ntiles, P, TSP)
    k = k.reshape(ntiles, TSP, P, nblk, B)
    return jnp.transpose(k, (3, 4, 0, 2, 1)), ntiles


def segment_operators_pallas(T, E, keys, valid, interpret=False):
    """Pallas-accelerated segment_operators.  Same contract as
    window_kernel.segment_operators (ops (S, M, M), logs (S,))."""
    S, L = keys.shape
    M = T.shape[0]
    n_keys = E.shape[0]
    P = LANES // M
    packed, ntiles = _pack_keys(keys, valid, n_keys, P)
    dtype = T.dtype

    Tblk = jnp.kron(jnp.eye(P, dtype=dtype), T.T)  # (128, 128)
    E_full = jnp.concatenate([E, jnp.zeros((1, M), dtype)], axis=0)
    eye = jnp.eye(M, dtype=dtype)
    X0 = jnp.broadcast_to(
        eye[None, :, :, None], (P, M, M, TSP)  # [g, i, k, s8]
    ).reshape(LANES, M * TSP)
    X0 = jnp.broadcast_to(X0[None], (ntiles, LANES, M * TSP))
    logs0 = jnp.zeros((ntiles, P, TSP), dtype)

    blk = _interpret_block if interpret else _block

    def outer(carry, kb):
        X, logs = carry
        X, logs = blk(Tblk, E_full, kb, X, logs, n_keys, M, P)
        return (X, logs), None

    (X, logs), _ = jax.lax.scan(outer, (X0, logs0), packed)
    # unpack: ops[s][i, k] with s = tile*TS + s8*P + g
    X5 = X.reshape(ntiles, P, M, M, TSP)  # (tile, g, i, k, s8)
    ops = jnp.transpose(X5, (0, 4, 1, 2, 3)).reshape(-1, M, M)
    logs_o = jnp.transpose(logs, (0, 2, 1)).reshape(-1)
    return ops[:S], logs_o[:S]


def _interpret_block(Tblk, E_full, keys_blk, Xin, logs, n_keys, M, P):
    "Pure-jnp reference of the block (runs anywhere; used in tests)."
    B = keys_blk.shape[0]

    def one_tile(X, lg, kb):
        for t in range(B):
            X = _fwd_step(Tblk, E_full, X, kb[t], n_keys, M, P)
        X, m = _rescale_block(X, M, P)
        return X, lg + jnp.log(m)

    return jax.vmap(one_tile)(Xin, logs, jnp.moveaxis(keys_blk, 0, 1))


def loglik_windows_pallas(pi, T, E, keys, valid, seg_of_contig,
                          interpret=False):
    "Drop-in for window_kernel.loglik_windows on supported shapes."
    from .hmm import _scan_chunks  # reuse the batched contig scan

    ops, logs = segment_operators_pallas(T, E, keys, valid, interpret)
    C, NS = seg_of_contig.shape
    Mdim = T.shape[0]
    pad = np.asarray(seg_of_contig) < 0
    idx = np.maximum(np.asarray(seg_of_contig), 0)
    eye = jnp.eye(Mdim, dtype=T.dtype)
    ops_c = jnp.where(pad[:, :, None, None], eye[None, None], ops[idx])
    logs_c = jnp.where(pad, 0.0, logs[idx])
    ll = _scan_chunks(pi, ops_c, logs_c)
    return jnp.sum(ll)


def estep_windows_pallas(pi, T, E, keys, valid, seg_of_contig,
                         interpret=False):
    def total_ll(pi, T, E):
        return loglik_windows_pallas(
            pi, T, E, keys, valid, seg_of_contig, interpret
        )

    ll, grads = jax.value_and_grad(total_ll, argnums=(0, 1, 2))(pi, T, E)
    return ll, pi * grads[0], T * grads[1], E * grads[2]
