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

Layout notes — the tunnel compile helper was qualified probe-by-probe and
accepts only a narrow Mosaic subset, which dictates the whole design:

* 2D blocks ONLY (any 3D BlockSpec crashes the remote compile helper).
  The alpha stream is therefore laid out (L*M, Sp): window i owns the
  M-row group starting at i*M, accessed with ``pl.ds(pl.multiple_of(
  i*M, M), M)`` — provably tile-aligned for f32 (8) when M % 8 == 0 and
  bf16 (16) when M % 16 == 0 (the eligibility gate enforces this).
* EVERY block — input and output — must be visited exactly once: the
  helper crashes on revisited blocks (even write-once under ``pl.when``)
  and on index maps mixing grid variables (``l*n_s + s``).  Affine maps
  of a SINGLE variable (``last - l``) are fine and give the descending
  sweep its reversal.  Consequences:
  - "constant" inputs (T, E, A_in, Q_end) are physically replicated to
    (n_l*rows, n_s*128) arrays so their index map is the injective
    (l, s); the per-step fetch is the same traffic a revisited block
    would cost, and the replicas are tens of MB at production scale
    (guarded by ``supported``).
  - carry/accumulator outputs are written EVERY window block into a
    per-(l, s) slot; the caller slices the last ``l`` block.
* block dims must be (8, 128)-divisible (or equal to the full array
  dim), so the key axis pads to a multiple of 128 (NK) and the (M, M)
  xisum accumulator is padded to (M, 128) via a zero-padded operand.
* the window axis of the packed key stream is read in aligned 8-row
  group loads (``pl.ds(pl.multiple_of(g*8, 8), 8)``) with static row
  extracts — single dynamic row reads are not provably aligned.
* keys/valid/vnext travel as ONE bit-packed int32 stream shaped (L, Sp):
  key in bits 0-15, valid bit 16, next-window-valid bit 17.
* ``fori_loop`` bounds are pinned to i32: python-int bounds give an i64
  induction variable under x64 whose index arithmetic Mosaic rejects
  (mixed-width ``arith.subi``).

Reference behavior being matched: the scaled forward/backward recursions
with per-position normalization of /root/reference/src/hmm.cpp:59-153; the
window-lockstep formulation and layouts are this repo's own
(ops/window_kernel.py:stats_pass is the XLA twin and the numerical oracle).

Scope: the default one-pop/two-pop window configuration — one-hot emission
rebuild (n_keys <= ONEHOT_MAX_KEYS), no emission stream, no alpha-remat,
no gamma emission, M % 8 == 0 (16 for bf16 carries).  Everything else
stays on the XLA path; selection is ``SMCPP_TPU_SWEEP=pallas`` (see
window_kernel.stats_pass).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Lane-dimension tile of the segment axis.  The alpha recursion is
# SERIAL along windows but independent across segments, and the grid
# runs segment tiles sequentially — so the serial-step count is
# n_s * L and wider tiles win (measured: 512-wide tiles ran 10x more
# serial steps than the XLA scan and lost 10%; at n_s = 2 the kernel
# beat it by 4%).  The descending kernel's VMEM working set caps the
# width (see _shapes); ``supported`` rejects shapes needing > 2 tiles.
_S_TILE_MAX = int(os.environ.get("SMCPP_TPU_PALLAS_ST", 8192))
# Per-core VMEM budget the descending kernel's working set must fit in
# (hardware ~16 MB; leave headroom for Mosaic's own scheduling slack —
# a lb=24/st=5120 build measured 21.1 MB against a 12.7 MB naive model,
# hence the generous fixed-cost terms in _shapes).
_VMEM_TARGET = 12 << 20
# The injective-map workaround replicates constants and snapshots per
# window block: ~4 * n_l * M * Sp * 4 bytes of HBM (the A/Q inits and
# the aend/u snapshot outputs dominate; ~1 GB at the C3 bench shape).
# Beyond this budget fall back to the XLA sweeps rather than burn HBM.
_REPL_BUDGET = int(1.6e9)

_KEY_MASK = np.int32((1 << 16) - 1)
_V_BIT = np.int32(1 << 16)
_VN_BIT = np.int32(1 << 17)


def _shapes(S, L, M, n_keys):
    "Per-call tiling: (Sp, Lp, s_tile, l_blk, NK)."
    Sp512 = -(-S // 512) * 512
    NK = -(-n_keys // 128) * 128
    # (st, lb) from a VMEM model of the DESCENDING kernel (the fatter
    # one): the double-buffered alphas (bf16) + enc blocks scale with
    # lb; the carry/init/out blocks, the (NK, st) one-hot transient and
    # the unrolled window body's temporaries scale with st alone — a
    # lb=16/st=5120/M=16 build measured 19.1 MB, i.e. ~2.7 KB/column of
    # fixed cost.  Wider tiles mean fewer serial steps, so take the
    # widest st whose budget still leaves a pipelining-worthy lb>=16
    # (fall through to the narrowest tile otherwise).
    st = None
    cand = min(Sp512, _S_TILE_MAX)
    while True:
        fixed = 2700 * cand + NK * cand * 2
        per_lb = 2 * M * cand * 2 + 2 * cand * 4
        lb = min(128, max(8, ((_VMEM_TARGET - fixed) // per_lb) // 8 * 8))
        st = cand
        if lb >= 16 or cand <= 512:
            break
        cand = max(512, cand // 2)
    Sp = -(-S // st) * st
    Lp = -(-L // lb) * lb
    return Sp, Lp, st, lb, NK


def _repl_bytes(S, L, M, n_keys):
    Sp, Lp, st, lb, NK = _shapes(S, L, M, n_keys)
    n_s, n_l = Sp // st, Lp // lb
    # asc: Tt, E, A_in; dsc: T, E, Q_end; outs: xo, gsum, aend, ustart
    per_step = (2 * NK + 4 * M) * 128 + 2 * M * st  # floats
    out = n_l * M * (2 * Sp + n_s * (128 + NK))
    return 4 * (n_s * n_l * per_step + out)


def supported(S, L, M, n_keys, carry_dtype):
    """Static-shape eligibility for these kernels (consulted by
    stats_pass in addition to its own configuration gate)."""
    import logging

    align = 16 if jnp.dtype(carry_dtype) == jnp.bfloat16 else 8
    if M % align:
        return False
    if n_keys > int(_KEY_MASK):
        return False
    log = logging.getLogger(__name__)
    Sp, _, st, _, _ = _shapes(S, L, M, n_keys)
    if Sp // st > 2:
        # the serial-step count is n_s * L; beyond two segment tiles the
        # extra steps outweigh the lower per-step overhead (measured:
        # n_s=2 +4% vs the XLA scan, n_s=4 -5%)
        log.info(
            "pallas sweeps unsupported at (S=%d, L=%d, M=%d, keys=%d): "
            "%d segment tiles — XLA sweeps selected",
            S, L, M, n_keys, Sp // st,
        )
        return False
    rb = _repl_bytes(S, L, M, n_keys)
    if rb > _REPL_BUDGET:
        log.info(
            "pallas sweeps unsupported at (S=%d, L=%d, M=%d, keys=%d): "
            "replication %.2f GB > budget — XLA sweeps selected",
            S, L, M, n_keys, rb / 1e9,
        )
        return False
    return True


def _pad_axis(x, mult, axis, fill=0):
    "Pad ``axis`` to a multiple of ``mult``."
    n = x.shape[axis]
    pad = (-n) % mult
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
    "Unpack one (s_tile,) int32 stream row -> (one-hot, valid, vnext)."
    k = row & _KEY_MASK
    kiota = jax.lax.broadcasted_iota(
        jnp.int32, (n_keys, row.shape[0]), 0
    )
    oh = (kiota == k[None, :])
    v = (row & _V_BIT) != 0
    vn = (row & _VN_BIT) != 0
    return oh, v, vn


def _rep(x, n_l, n_s, lanes=None):
    """Replicate a (r, c) constant to (n_l*r, n_s*cp) for an injective
    (l, s) index map, padding the column axis to ``lanes`` (or S_TILE
    columns are passed through when ``lanes`` is None and the column
    axis is already the padded segment axis — then only the row
    replication applies)."""
    if lanes is not None:
        x = _pad_axis(x, lanes, 1)
        x = jnp.tile(x, (n_l, n_s))
    else:
        x = jnp.tile(x, (n_l, 1))
    return x


def _asc_kernel(enc_ref, tT_ref, e_ref, a_in_ref,
                alphas_ref, aend_ref, carry, *, M, tiny, bf16):
    """Ascending alpha sweep for one (s_tile, l_blk) grid step.

    Grid is (S_tiles, n_l) with the window axis innermost: for a fixed
    segment tile the carry scratch persists across the window blocks."""
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        carry[:] = a_in_ref[:]  # (M, s_tile) f32

    E = e_ref[:, :M]            # (NK, M)
    Tt = tT_ref[:, :M]          # (M, M) = T.T
    NK = E.shape[0]
    l_blk = enc_ref.shape[0]

    def group(g, aT):
        base = pl.multiple_of(g * 8, 8)
        grp = enc_ref[pl.ds(base, 8), :]  # (8, s_tile) int32
        for j in range(8):
            i = g * 8 + j
            oh, v, _ = _decode(grp[j, :], NK)
            eT = _dot(E, oh.astype(E.dtype), ((0,), (0,)), bf16)
            anew = eT * _dot(Tt, aT, ((1,), (0,)), bf16)
            anew = anew / jnp.maximum(
                jnp.max(anew, axis=0, keepdims=True), tiny
            )
            aT = jnp.where(v[None, :], anew, aT)
            alphas_ref[pl.ds(pl.multiple_of(i * M, M), M), :] = (
                aT.astype(alphas_ref.dtype))
        return aT

    aT = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(l_blk // 8), group, carry[:]
    )
    carry[:] = aT
    aend_ref[:] = aT


def _dsc_kernel(enc_ref, alphas_ref, t_ref, e_ref, q_end_ref,
                u_ref, xo_ref, gsum_ref,
                q_carry, u_carry, xo_acc, gsum_acc, *, M, tiny, bf16):
    """Descending beta sweep for one (s_tile, l_blk) grid step (the window
    axis runs REVERSED via ``last - l`` index maps; within the block the
    loop also walks backwards)."""
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        q_carry[:] = q_end_ref[:]          # (M, s_tile)
        u_carry[:] = jnp.zeros_like(u_carry)
        xo_acc[:] = jnp.zeros_like(xo_acc)
        gsum_acc[:] = jnp.zeros_like(gsum_acc)

    E = e_ref[:, :M]            # (NK, M)
    T = t_ref[:, :M]
    NK = E.shape[0]
    l_blk = enc_ref.shape[0]
    n_g = l_blk // 8

    def group(gg, carry):
        qT, uT, xo, gsum = carry
        g = jnp.asarray(n_g - 1, gg.dtype) - gg
        base = pl.multiple_of(g * 8, 8)
        grp = enc_ref[pl.ds(base, 8), :]
        for j in range(7, -1, -1):
            i = g * 8 + j
            oh, v, vn = _decode(grp[j, :], NK)
            ohf = oh.astype(E.dtype)
            aT = alphas_ref[
                pl.ds(pl.multiple_of(i * M, M), M), :
            ].astype(E.dtype)
            eT = _dot(E, ohf, ((0,), (0,)), bf16)
            tv = _dot(T, uT, ((1,), (0,)), bf16)
            qun = jnp.where(vn[None, :], tv, qT)
            Z = jnp.maximum(jnp.sum(aT * qun, axis=0), tiny)  # (S_TILE,)
            gamma = (aT * qun / Z[None, :]) * v[None, :]
            ascale = (aT / Z[None, :]) * (v & vn)[None, :]
            # per-key masses keep exact-f32 operands like the XLA sweep
            # (a bf16 gamma operand costs ~4e-5 total-mass drift; the
            # one-hot is 0/1-exact either way)
            g_k = _dot(gamma, ohf, ((1,), (1,)), False)   # (M, NK)
            xi_c = _dot(ascale, uT, ((1,), (1,)), bf16)   # (M, M)
            qn = qun / jnp.maximum(
                jnp.max(qun, axis=0, keepdims=True), tiny
            )
            qT = jnp.where(v[None, :], qn, qT)
            uT = jnp.where(v[None, :], eT * qT, uT)
            # the accumulator carries (M, 128) so its snapshot lands in a
            # clean full-block write; only [:, :M] is meaningful (pad the
            # small dot result — .at[].add lowers to scatter-add, which
            # Mosaic does not implement)
            xo = xo + jnp.concatenate(
                [xi_c, jnp.zeros((xi_c.shape[0], 128 - M), jnp.float32)],
                axis=1,
            )
            gsum = gsum + g_k
        return qT, uT, xo, gsum

    qT, uT, xo, gsum = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_g), group,
        (q_carry[:], u_carry[:], xo_acc[:], gsum_acc[:]),
    )
    q_carry[:] = qT
    u_carry[:] = uT
    xo_acc[:] = xo
    gsum_acc[:] = gsum
    # running carries land in this (l, s) slot; the caller reads the
    # last window block's slot (the only injective-map way to get
    # VMEM state out of this helper — see layout notes)
    u_ref[:] = uT
    xo_ref[:] = xo
    gsum_ref[:] = gsum


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
    Sp, Lp, st, lb, NK = _shapes(S, L, M, n_keys)
    n_s, n_l = Sp // st, Lp // lb
    tiny = float(np.finfo(np.float32).tiny)

    # pad the segment axis to the lane tile and the window axis to the
    # block size; padded windows carry valid=0 so every recursion and
    # statistic passes through them unchanged (vnext is computed from
    # the PADDED valid so the last real window keeps vnext=0)
    keysT = _pad_axis(_pad_axis(jnp.asarray(keysT, jnp.int32), st, 1),
                      lb, 0)
    valid_i = _pad_axis(
        _pad_axis(jnp.asarray(validT).astype(jnp.int32), st, 1), lb, 0
    )
    A_inT = _pad_axis(jnp.asarray(A_in, jnp.float32).T, st, 1)
    Q_endT = _pad_axis(jnp.asarray(Q_end, jnp.float32).T, st, 1)

    Tf = jnp.asarray(T, jnp.float32)
    Ef = _pad_axis(jnp.asarray(E, jnp.float32), 128, 0)  # (NK, M)

    vnext_i = jnp.concatenate(
        [valid_i[1:], jnp.zeros((1, Sp), jnp.int32)], axis=0
    )
    enc = keysT | (valid_i << jnp.int32(16)) | (vnext_i << jnp.int32(17))

    # constant operands replicated per (l, s) grid step; the carry-init
    # arrays are only READ at l == 0 so the l > 0 blocks stay zero (the
    # injective-map rule still forces the full-size allocation)
    T_r = _rep(Tf, n_l, n_s, lanes=128)        # (n_l*M, n_s*128)
    Tt_r = _rep(Tf.T, n_l, n_s, lanes=128)
    E_r = _rep(Ef, n_l, n_s, lanes=128)        # (n_l*NK, n_s*128)
    A_r = jnp.zeros((n_l * M, Sp), jnp.float32).at[:M].set(A_inT)
    Q_r = jnp.zeros((n_l * M, Sp), jnp.float32).at[:M].set(Q_endT)

    enc_spec = pl.BlockSpec((lb, st), lambda s, l: (l, s),
                            memory_space=pltpu.VMEM)
    alphas_spec = pl.BlockSpec((lb * M, st), lambda s, l: (l, s),
                               memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec((M, st), lambda s, l: (l, s),
                              memory_space=pltpu.VMEM)
    mm_spec = pl.BlockSpec((M, 128), lambda s, l: (l, s),
                           memory_space=pltpu.VMEM)
    ek_spec = pl.BlockSpec((NK, 128), lambda s, l: (l, s),
                           memory_space=pltpu.VMEM)

    alphas, aend = pl.pallas_call(
        partial(_asc_kernel, M=M, tiny=tiny, bf16=bf16),
        grid=(n_s, n_l),
        in_specs=[enc_spec, mm_spec, ek_spec, carry_spec],
        out_specs=(alphas_spec, carry_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Lp * M, Sp), alpha_dtype),
            jax.ShapeDtypeStruct((n_l * M, Sp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((M, st), jnp.float32)],
        interpret=interpret,
    )(enc, Tt_r, E_r, A_r)

    # reversed window-block iteration; keep the constant in the grid
    # index's i32 dtype (a python int lowers to i64 under x64 and Mosaic
    # rejects the mixed subtraction)
    _last = np.int32(n_l - 1)
    rev_enc_spec = pl.BlockSpec((lb, st), lambda s, l: (_last - l, s),
                                memory_space=pltpu.VMEM)
    rev_alphas_spec = pl.BlockSpec(
        (lb * M, st), lambda s, l: (_last - l, s),
        memory_space=pltpu.VMEM,
    )
    u_out, xo_t, gsum_t = pl.pallas_call(
        partial(_dsc_kernel, M=M, tiny=tiny, bf16=bf16),
        grid=(n_s, n_l),
        in_specs=[rev_enc_spec, rev_alphas_spec,
                  mm_spec, ek_spec, carry_spec],
        out_specs=(
            carry_spec,                                   # u snapshots
            pl.BlockSpec((M, 128), lambda s, l: (l, s),
                         memory_space=pltpu.VMEM),        # xo snapshots
            pl.BlockSpec((M, NK), lambda s, l: (l, s),
                         memory_space=pltpu.VMEM),        # gsum snapshots
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_l * M, Sp), jnp.float32),
            jax.ShapeDtypeStruct((n_l * M, n_s * 128), jnp.float32),
            jax.ShapeDtypeStruct((n_l * M, n_s * NK), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, st), jnp.float32),
            pltpu.VMEM((M, st), jnp.float32),
            pltpu.VMEM((M, 128), jnp.float32),
            pltpu.VMEM((M, NK), jnp.float32),
        ],
        interpret=interpret,
    )(enc, alphas, _rep(Tf, n_l, n_s, lanes=128), E_r, Q_r)

    last = (n_l - 1) * M
    alpha_end = aend[last:last + M, :S].T            # (S, M)
    u_start = u_out[last:last + M, :S].T
    xo = jnp.sum(
        xo_t[last:last + M].reshape(M, n_s, 128)[:, :, :M]
        .astype(jnp.float64), axis=1,
    )
    gsum = jnp.sum(
        gsum_t[last:last + M].reshape(M, n_s, NK).astype(jnp.float64),
        axis=1,
    ).T[:n_keys]                                     # (n_keys, M)
    return alpha_end, u_start, xo, gsum
