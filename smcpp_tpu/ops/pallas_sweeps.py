"""Pallas TPU kernels for the stat-sweep phase of the direct E-step.

The direct Baum-Welch E-step (ops/window_kernel.py:estep_direct) spends its
post-operator time in two lockstep sweeps over the window axis — an
ascending alpha recursion that stores the per-window alpha stream, and a
descending beta recursion that accumulates the xisum / per-key posterior
statistics.  The XLA formulation runs them as ``lax.scan`` with ``unroll=8``;
per-step loop bookkeeping and fusion boundaries remain a real fraction of
step time at L ~ 8k windows (measured: unrolling alone bought +29%).

These kernels run each sweep as ONE Pallas program: the (M, S_tile)
carries stay VMEM-resident across the whole window axis, the alpha stream
is pipelined to/from HBM by the BlockSpec machinery, and the per-step
emission one-hot / matmuls feed the MXU directly.  Accumulators are f32
per segment-tile (error ~1e-6 relative over 8k steps — far below the
kernel's bf16 statistic noise) and are reduced in f64 by the caller.

Layout notes (Mosaic constraints found while qualifying):

* keys/valid/vnext travel as ONE bit-packed int32 stream shaped
  (L, 1, S): key in bits 0-15, valid bit 16, next-window-valid bit 17.
  Packing cuts the stream's HBM traffic vs three arrays, and the
  (L, 1, S) shape puts the dynamically-indexed window axis on an UNTILED
  leading dimension — a (l_blk, S_tile) block keyed by the window axis
  puts it on the sublane dimension, where Mosaic requires dynamic row
  indices to be provably tile-aligned ("cannot statically prove that
  index in dimension 0 is a multiple of 8").
* ``fori_loop`` bounds are pinned to i32: python-int bounds give an i64
  induction variable under x64 whose index arithmetic Mosaic rejects
  (mixed-width ``arith.subi``).

Reference behavior being matched: the scaled forward/backward recursions
with per-position normalization of /root/reference/src/hmm.cpp:59-153; the
window-lockstep formulation and layouts are this repo's own
(ops/window_kernel.py:stats_pass is the XLA twin and the numerical oracle).

Scope: the default one-pop/two-pop window configuration — one-hot emission
rebuild (n_keys <= ONEHOT_MAX_KEYS), no emission stream, no alpha-remat,
no gamma emission.  Everything else stays on the XLA path; selection is
``SMCPP_TPU_SWEEP=pallas`` (see window_kernel.stats_pass).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane-dimension tile of the segment axis.  128 is the hardware lane
# width; 512 keeps the per-step (M, S_tile) ops wide enough to amortize
# loop overhead while the working set (packed-stream/alpha blocks +
# carries) stays a few MB of VMEM.
S_TILE = 512
# Window-axis block: alphas move HBM<->VMEM in (L_BLK, M, S_TILE) slabs.
L_BLK = 128

_KEY_MASK = np.int32((1 << 16) - 1)
_V_BIT = np.int32(1 << 16)
_VN_BIT = np.int32(1 << 17)


def _pad_s(x, s_tile, axis, fill=0):
    "Pad ``axis`` (the segment axis) to a multiple of s_tile."
    S = x.shape[axis]
    pad = (-S) % s_tile
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _dot(a, b, dims, bf16):
    """dot_general with f32 accumulation; ``bf16`` pre-rounds the operands
    to bfloat16 — the same single-pass MXU rounding jax's 'default' matmul
    precision applies in the XLA sweeps."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


def _decode(row, n_keys):
    "Unpack one (S_TILE,) int32 stream row -> (one-hot, valid, vnext)."
    k = row & _KEY_MASK
    kiota = jax.lax.broadcasted_iota(jnp.int32, (n_keys, S_TILE), 0)
    oh = (kiota == k[None, :])
    v = (row & _V_BIT) != 0
    vn = (row & _VN_BIT) != 0
    return oh, v, vn


def _asc_kernel(enc_ref, tT_ref, e_ref, a_in_ref,
                alphas_ref, alpha_end_ref, carry, *, n_l, tiny, bf16):
    """Ascending alpha sweep for one (s_tile, l_blk) grid step.

    Grid is (S_tiles, n_l) with the window axis innermost: for a fixed
    segment tile the carry scratch persists across the window blocks."""
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        carry[:] = a_in_ref[:]  # (M, S_TILE) f32

    E = e_ref[:]          # (n_keys, M)
    Tt = tT_ref[:]        # (M, M) = T.T
    n_keys = E.shape[0]

    def body(i, aT):
        oh, v, _ = _decode(enc_ref[i, 0, :], n_keys)
        eT = _dot(E, oh.astype(E.dtype), ((0,), (0,)), bf16)  # (M, S_TILE)
        anew = eT * _dot(Tt, aT, ((1,), (0,)), bf16)
        anew = anew / jnp.maximum(
            jnp.max(anew, axis=0, keepdims=True), tiny
        )
        aT = jnp.where(v[None, :], anew, aT)
        alphas_ref[i, :, :] = aT.astype(alphas_ref.dtype)
        return aT

    carry[:] = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(enc_ref.shape[0]), body, carry[:]
    )

    @pl.when(l == n_l - 1)
    def _():
        alpha_end_ref[:] = carry[:]


def _dsc_kernel(enc_ref, alphas_ref, t_ref, tT_ref,
                e_ref, q_end_ref, u_start_ref, xo_ref, gsum_ref,
                q_carry, u_carry, xo_acc, gsum_acc, *, n_l, tiny, bf16):
    """Descending beta sweep for one (s_tile, l_blk) grid step (the window
    axis runs REVERSED via the index maps; within the block the loop also
    walks backwards)."""
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        q_carry[:] = q_end_ref[:]          # (M, S_TILE)
        u_carry[:] = jnp.zeros_like(u_carry)
        xo_acc[:] = jnp.zeros_like(xo_acc)
        gsum_acc[:] = jnp.zeros_like(gsum_acc)

    E = e_ref[:]
    T = t_ref[:]
    Tt = tT_ref[:]
    n_keys = E.shape[0]
    L_blk = enc_ref.shape[0]

    def body(j, carry):
        qT, uT, xo, gsum = carry
        i = jnp.asarray(L_blk - 1, j.dtype) - j
        oh, v, vn = _decode(enc_ref[i, 0, :], n_keys)
        ohf = oh.astype(E.dtype)
        aT = alphas_ref[i, :, :].astype(E.dtype)
        eT = _dot(E, ohf, ((0,), (0,)), bf16)
        tv = _dot(T, uT, ((1,), (0,)), bf16)
        qun = jnp.where(vn[None, :], tv, qT)
        Z = jnp.maximum(jnp.sum(aT * qun, axis=0), tiny)  # (S_TILE,)
        gamma = (aT * qun / Z[None, :]) * v[None, :]
        ascale = (aT / Z[None, :]) * (v & vn)[None, :]
        # per-key masses keep exact-f32 operands like the XLA sweep (a
        # bf16 gamma operand costs ~4e-5 total-mass drift; the one-hot is
        # 0/1-exact either way); full-S contraction feeds the MXU well.
        g_k = _dot(gamma, ohf, ((1,), (1,)), False)  # (M, n_keys)
        xi_c = _dot(ascale, uT, ((1,), (1,)), bf16)  # (M, M)
        qn = qun / jnp.maximum(jnp.max(qun, axis=0, keepdims=True), tiny)
        qT = jnp.where(v[None, :], qn, qT)
        uT = jnp.where(v[None, :], eT * qT, uT)
        return qT, uT, xo + xi_c, gsum + g_k

    qT, uT, xo, gsum = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(L_blk), body,
        (q_carry[:], u_carry[:], xo_acc[:], gsum_acc[:]),
    )
    q_carry[:] = qT
    u_carry[:] = uT
    xo_acc[:] = xo
    gsum_acc[:] = gsum

    @pl.when(l == n_l - 1)
    def _():
        u_start_ref[:] = uT
        xo_ref[0] = xo
        gsum_ref[0] = gsum


def sweeps(T, E, keysT, validT, A_in, Q_end, alpha_dtype=jnp.bfloat16,
           precision="default", interpret=False):
    """Both stat sweeps as Pallas programs.

    Inputs mirror window_kernel.stats_pass in its transposed layout:
    ``keysT``/``validT`` (L, S), ``A_in``/``Q_end`` (S, M) f32; T (M, M),
    E (n_keys, M) f32.  Returns (alpha_end (S, M), u_start (S, M),
    xo (M, M) f64, gsum (n_keys, M) f64) — same contract (and the same
    window-local normalization scheme) as the XLA sweeps.  ``precision``
    follows the repo's matmul-precision strings: 'default'/'bfloat16'
    rounds dot operands to bf16 (single MXU pass, like the XLA path);
    anything else runs exact-f32 dots.
    """
    bf16 = precision in ("default", "bfloat16")
    L, S = keysT.shape
    M = T.shape[0]
    n_keys = E.shape[0]
    assert n_keys <= int(_KEY_MASK), n_keys
    l_blk = next(b for b in (L_BLK, 64, 32, 16, 8, 4, 2, 1) if L % b == 0)
    tiny = float(np.finfo(np.float32).tiny)

    keysT = _pad_s(jnp.asarray(keysT, jnp.int32), S_TILE, 1)
    valid_i = _pad_s(jnp.asarray(validT).astype(jnp.int32), S_TILE, 1)
    A_inT = _pad_s(jnp.asarray(A_in, jnp.float32).T, S_TILE, 1)
    Q_endT = _pad_s(jnp.asarray(Q_end, jnp.float32).T, S_TILE, 1)
    Sp = keysT.shape[1]
    n_s = Sp // S_TILE
    n_l = L // l_blk

    Tf = jnp.asarray(T, jnp.float32)
    Ef = jnp.asarray(E, jnp.float32)

    vnext_i = jnp.concatenate(
        [valid_i[1:], jnp.zeros((1, Sp), jnp.int32)], axis=0
    )
    enc = (
        keysT | (valid_i << jnp.int32(16)) | (vnext_i << jnp.int32(17))
    ).reshape(L, 1, Sp)

    enc_spec = pl.BlockSpec((l_blk, 1, S_TILE), lambda s, l: (l, 0, s),
                            memory_space=pltpu.VMEM)
    mat_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s, l: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    carry_spec = pl.BlockSpec((M, S_TILE), lambda s, l: (0, s),
                              memory_space=pltpu.VMEM)

    alphas, alpha_endT = pl.pallas_call(
        partial(_asc_kernel, n_l=n_l, tiny=tiny, bf16=bf16),
        grid=(n_s, n_l),
        in_specs=[
            enc_spec,                    # packed key/valid/vnext stream
            mat_spec((M, M)),            # T.T
            mat_spec((n_keys, M)),       # E
            carry_spec,                  # A_inT
        ],
        out_specs=(
            pl.BlockSpec((l_blk, M, S_TILE), lambda s, l: (l, 0, s),
                         memory_space=pltpu.VMEM),
            carry_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, M, Sp), alpha_dtype),
            jax.ShapeDtypeStruct((M, Sp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((M, S_TILE), jnp.float32)],
        interpret=interpret,
    )(enc, Tf.T, Ef, A_inT)

    # reversed window-block iteration; keep the constant in the grid
    # index's i32 dtype (a python int lowers to i64 under x64 and Mosaic
    # rejects the mixed subtraction)
    _last = np.int32(n_l - 1)
    u_startT, xo_t, gsum_t = pl.pallas_call(
        partial(_dsc_kernel, n_l=n_l, tiny=tiny, bf16=bf16),
        grid=(n_s, n_l),
        in_specs=[
            pl.BlockSpec((l_blk, 1, S_TILE), lambda s, l: (_last - l, 0, s),
                         memory_space=pltpu.VMEM),  # stream (reversed)
            pl.BlockSpec((l_blk, M, S_TILE), lambda s, l: (_last - l, 0, s),
                         memory_space=pltpu.VMEM),  # alphas (reversed)
            mat_spec((M, M)),            # T
            mat_spec((M, M)),            # T.T
            mat_spec((n_keys, M)),       # E
            carry_spec,                  # Q_endT
        ],
        out_specs=(
            carry_spec,                                       # u_start
            pl.BlockSpec((1, M, M), lambda s, l: (s, 0, 0),
                         memory_space=pltpu.VMEM),            # xo tiles
            pl.BlockSpec((1, M, n_keys), lambda s, l: (s, 0, 0),
                         memory_space=pltpu.VMEM),            # gsum tiles
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, Sp), jnp.float32),
            jax.ShapeDtypeStruct((n_s, M, M), jnp.float32),
            jax.ShapeDtypeStruct((n_s, M, n_keys), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, S_TILE), jnp.float32),
            pltpu.VMEM((M, S_TILE), jnp.float32),
            pltpu.VMEM((M, M), jnp.float32),
            pltpu.VMEM((M, n_keys), jnp.float32),
        ],
        interpret=interpret,
    )(enc, alphas, Tf, Tf.T, Ef, Q_endT)

    xo = jnp.sum(xo_t.astype(jnp.float64), axis=0)
    gsum = jnp.sum(gsum_t.astype(jnp.float64), axis=0).T  # (n_keys, M)
    return (
        alpha_endT[:, :S].T,
        u_startT[:, :S].T,
        xo,
        gsum,
    )
