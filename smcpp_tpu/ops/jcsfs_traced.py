"""Traced JCSFS pipeline: the full (general-M) two-population emission
tensor as ONE jitted function of (a1, a2, split).

The eager path (ops/jcsfs.py) rebuilds ~0.1 s of host NumPy per E-step/Q
call — per-hidden-interval truncated/shifted CSFS grids, Moran transports,
quadratures — because `shift_params`/`truncate_params` change array lengths
and each hidden interval branches on its position relative to the split
(below / straddling / above).  This module removes every dynamic shape so
the whole tensor setup traces once and replays in ~1 ms:

* **Dual-slot grids.**  Every piece of the static merged partition of
  {model piece boundaries} u {hidden states} is split into a *below-split
  slot* and an *above-split slot* whose widths are traced clips
  (``clip(min(hi, split) - lo, 0)`` / ``clip(hi - max(lo, split), 0)``).
  Because clipping at the split preserves the (static) sort order of the
  merged boundaries, node positions, ``src`` maps, and hidden-state node
  indices are all static; only widths are traced.  Truncation at the split
  = below slots keep the model size, above slots get zero width, and a
  static crash piece (CRASH_A) is appended; shifting to the split = below
  slots get zero width (node times become ``max(t - split, 0)``); the
  "apart" model = below slots at a huge-but-finite size.  The tjj kernels
  (ops/ratefunc.py) already mask zero-width pieces generically.
* **Unified straddle weights.**  The eager per-interval branch becomes one
  formula: with ``ex_m = exp(-R1(hs_m))`` the above-split weight is
  ``w_m = clip((exp(-R1(split)) - ex_{m+1}) / (ex_m - ex_{m+1}), 0, 1)``
  — exactly 0 for intervals below the split, exactly 1 above, and the
  reference's straddle weight in between (jcsfs.cpp:370-420).  Intervals
  on the wrong side of the split produce zero-width conditioning windows
  whose (finite-garbage or NaN) CSFS rows are removed with ``where`` masks
  before weighting, so no NaN ever reaches the output.  (Value path only:
  the E-step/Q consumers never differentiate through this program.)
* **Batched conditioning.**  All M per-interval truncated/shifted CSFS
  evaluations collapse to single `conditioned_sfs` calls on the dual
  grids (the hidden-state boundaries of a dual grid are the static node
  pairs), and the per-interval Gauss-Legendre transports batch over
  (M, K) with the Moran eigendecompositions held as static constants.

Known (documented) deviations from the eager path, both tolerance-tested
in tests/test_jcsfs_traced.py:

* the below-at-split CSFS uses the exact eps -> 0 closed form
  (ops/split_objective.py:_tb0_integrals rationale) instead of the eager
  two-sided 1e-6 interval around the split;
* pop 2 below the split uses the raw model2 history; the eager path uses
  the for_pop(pid2) splice, which re-fits a spline through the same
  below-split values (identical up to the re-fit's sampling grid — only
  R2(split) and the truncation below the split ever enter the JCSFS).

Reference: /root/reference/src/jcsfs.cpp (pre_compute_together :370-420,
helpers :89-216; pre_compute_apart :257-367), documented twin
smcpp/jcsfs.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import defaults
from . import csfs as csfs_mod
from . import exact
from .grid import TimeGrid, make_time_grid
from .jcsfs import _modified, _moran
from .split_objective import CRASH_A, _leggauss01, _undist_matrix

# finite stand-in for the apart model's infinite pre-split size: 1e12
# leaves < 1e-12 spurious coalescent mass over any O(1) interval, while
# 1e300 overflows the closed-form 3x3 expm at M > 1 (NaN transition rows).
APART_FIN = 1e12


# ---------------------------------------------------------------------------
# static partition + traced dual-slot grids
# ---------------------------------------------------------------------------

class _Part:
    """Static merged partition of model piece boundaries and hidden states.

    Everything here is host NumPy, computed once at construction; the
    traced dual-grid builders below only combine these constants with the
    traced split scalar."""

    def __init__(self, s, hidden_states):
        g = make_time_grid(s, hidden_states)
        self.K = g.K
        self.lo = g.ts[:-1].copy()
        # cap the terminal inf boundary so clip arithmetic stays finite
        hi = g.ts[1:].copy()
        hi[-1] = np.finfo(np.float64).max
        self.hi = hi
        self.src = g.src
        self.hs_indices = g.hs_indices
        self.hidden_states = np.asarray(g.hidden_states, np.float64)


def _interleave(x, y):
    "(K,), (K,) -> (2K,) alternating x0, y0, x1, y1, ..."
    return jnp.stack([x, y], axis=1).reshape(-1)


def _grid_from(dt, src, hs_idx, hidden_states):
    ts = jnp.concatenate([jnp.zeros(1, dt.dtype), jnp.cumsum(dt)])
    return TimeGrid(
        ts=ts, dt=dt, src=src, hs_indices=hs_idx,
        hidden_states=hidden_states,
    )


def trunc_dual(part: _Part, a_model, split, include_crash):
    """Dual grid of the model truncated at ``split``.

    Below slots keep the model size over ``clip(min(hi, split) - lo, 0)``;
    above slots are zero-width (node times become ``min(t, split)``); a
    static crash piece (CRASH_A, BIG_T) follows.  ``include_crash`` puts
    the crash region inside the terminal hidden interval (the eager
    [0, inf] conditioning of a truncated model, where lineages surviving
    to the split coalesce in the crash), vs ending the hidden window at
    the split (per-interval conditioning bounded by min(hs, split))."""
    w_b = jnp.clip(jnp.minimum(jnp.asarray(part.hi), split)
                   - jnp.asarray(part.lo), 0.0, None)
    K = part.K
    dt = jnp.concatenate(
        [_interleave(w_b, jnp.zeros_like(w_b)),
         jnp.array([defaults.BIG_T])]
    )
    a_pieces = jnp.asarray(a_model)[part.src]
    crash = jnp.full_like(a_pieces, CRASH_A)
    a_dual = jnp.concatenate(
        [_interleave(a_pieces, crash), jnp.array([CRASH_A])]
    )
    hs_idx = 2 * part.hs_indices
    if include_crash:
        hs_idx = hs_idx.copy()
        hs_idx[-1] = 2 * K + 1
    grid = _grid_from(dt, np.arange(2 * K + 1, dtype=np.int64), hs_idx,
                      part.hidden_states)
    return a_dual, grid


def shift_dual(part: _Part, a_model, split):
    """Dual grid of the model shifted to start at ``split``: below slots
    zero-width, above slots ``clip(hi - max(lo, split), 0)`` — node times
    become ``max(t - split, 0)``, so hidden boundary m sits at
    ``max(hs_m - split, 0)`` at its static node index."""
    w_a = jnp.clip(jnp.asarray(part.hi)
                   - jnp.maximum(jnp.asarray(part.lo), split), 0.0, None)
    w_a = w_a.at[-1].set(defaults.BIG_T)
    dt = _interleave(jnp.zeros_like(w_a), w_a)
    a_pieces = jnp.asarray(a_model)[part.src]
    a_dual = _interleave(a_pieces, a_pieces)
    grid = _grid_from(dt, np.arange(2 * part.K, dtype=np.int64),
                      2 * part.hs_indices, part.hidden_states)
    return a_dual, grid


def apart_grid_hs(a_model, part: _Part, split, hidden_states):
    """Dual grid of the 'apart' distinguished model — huge size (no
    coalescence) below the split, model sizes above — with the hidden
    states spliced at static node indices.  Used for the apart model's
    pi / transition / average coalescence times (real time axis).
    ``hidden_states`` must equal the ones ``part`` was built with."""
    del hidden_states  # part carries them; kept for call-site clarity
    lo = jnp.asarray(part.lo)
    hi = jnp.asarray(part.hi)
    w_b = jnp.clip(jnp.minimum(hi, split) - lo, 0.0, None)
    w_a = jnp.clip(hi - jnp.maximum(lo, split), 0.0, None)
    w_a = w_a.at[-1].set(defaults.BIG_T)
    dt = _interleave(w_b, w_a)
    a_pieces = jnp.asarray(a_model)[part.src]
    a_dual = _interleave(jnp.full_like(a_pieces, APART_FIN), a_pieces)
    grid = _grid_from(dt, np.arange(2 * part.K, dtype=np.int64),
                      2 * part.hs_indices, part.hidden_states)
    return a_dual, grid


# ---------------------------------------------------------------------------
# small traced helpers
# ---------------------------------------------------------------------------

class _TracedEta:
    "Static piece widths, traced sizes; R / Rinv at traced times."

    def __init__(self, a, s):
        self.a = jnp.asarray(a)
        s = np.asarray(s, np.float64)
        self.cs = np.concatenate([[0.0], np.cumsum(s)])
        self.cs[-1] = np.inf
        ada = 1.0 / self.a
        self.ada = ada
        widths = jnp.asarray(np.diff(self.cs[:-1]))
        self.Rrng = jnp.concatenate(
            [jnp.zeros(1, ada.dtype), jnp.cumsum(ada[:-1] * widths)]
        )

    def R(self, t):
        ip = jnp.clip(
            jnp.searchsorted(jnp.asarray(self.cs), t, side="right") - 1,
            0, len(self.a) - 1,
        )
        cs = jnp.asarray(self.cs[:-1])
        return self.Rrng[ip] + self.ada[ip] * (t - cs[ip])


def _expm_at(eig, ts):
    "U exp(D t) Uinv at traced times of any shape (...,) -> (..., N, N)."
    U = jnp.asarray(eig.U)
    D = jnp.asarray(eig.D)
    Ui = jnp.asarray(eig.Uinv)
    e = jnp.exp(ts[..., None] * D)  # (..., N)
    return jnp.einsum("ij,...j,jl->...il", U, e, Ui)


def _tb0_traced(eta: _TracedEta, split, n):
    """Closed-form ``int_0^split exp(-rate_j R(t)) dt`` with traced sizes
    (the exact eps -> 0 below-at-split limit; split_objective.py:162-181)."""
    js = np.arange(2, n + 3)
    rates = (js * (js - 1) // 2 - 1).astype(np.float64)[:, None]
    lo = eta.cs[:-1]
    hi = np.where(np.isinf(eta.cs[1:]), np.finfo(np.float64).max,
                  eta.cs[1:])
    delta = jnp.clip(jnp.minimum(jnp.asarray(hi), split)
                     - jnp.asarray(lo), 0.0, None)[None, :]
    Rk = eta.Rrng[None, :]
    ada = eta.ada[None, :]
    rates_safe = np.where(rates == 0, 1.0, rates)
    v_pos = (
        jnp.exp(-rates * Rk)
        * (-jnp.expm1(-rates_safe * ada * delta))
        / (rates_safe * ada)
    )
    v = jnp.where(rates == 0, delta, v_pos)
    return jnp.sum(v, axis=1)  # (n+1,)


def _csfs(a, grid, n):
    return csfs_mod.conditioned_sfs(a, grid, n, xp=jnp)  # (M, 3, n+1)


# ---------------------------------------------------------------------------
# the traced JCSFS
# ---------------------------------------------------------------------------

class TracedJointCSFS:
    """J[m] (a1+1, (n1+1)(a2+1)(n2+1)) for all M hidden intervals as one
    traceable function of (a1 sizes, a2 sizes, split).

    Static at construction: both marginal piece grids (s1, s2), the hidden
    states, sample configuration, hypergeometric kernels, Moran
    eigensystems, quadrature rule.  Traced at call time: the marginal
    stepwise size vectors and the split scalar."""

    def __init__(self, n1, n2, a1, a2, s1, s2, hidden_states, K=10):
        assert a1 + a2 == 2 and a1 in (1, 2) and a2 in (0, 1)
        self.n1, self.n2, self.a1, self.a2 = n1, n2, a1, a2
        self.hs = np.asarray(hidden_states, np.float64)
        self.M = len(self.hs) - 1
        self.K = K
        self.s1 = np.asarray(s1, np.float64)
        self.s2 = np.asarray(s2, np.float64)

        # static partitions: per-interval conditioning needs the hidden
        # states spliced in; whole-axis ([0, inf]) conditioning does not
        self.part1 = _Part(self.s1, self.hs)
        self.part1_single = _Part(self.s1, np.array([0.0, np.inf]))
        self.part2_single = _Part(self.s2, np.array([0.0, np.inf]))

        # combinatorial kernels (identical to the eager JointCSFS)
        from .jcsfs import JointCSFS

        ref = JointCSFS(n1, n2, a1, a2, [0.0, np.inf], K=K)
        self.hyp1, self.hyp2 = ref.hyp1, ref.hyp2
        self.S0, self.S2, self.Sn1 = ref.S0, ref.S2, ref.Sn1
        self.quad_u, self.quad_w = _leggauss01(K)

        self._U_n1 = _undist_matrix(n1)
        if a1 == 2:
            self._U_n12m1 = _undist_matrix(n1 + n2 - 1)
            if n2 >= 2:
                self._U_n2m2 = _undist_matrix(n2 - 2)
        else:
            self._U_n1m1 = _undist_matrix(n1 - 1) if n1 >= 1 else None
            self._U_n2m1 = _undist_matrix(n2 - 1) if n2 >= 1 else None

        # static index maps for the hypergeometric gathers
        IDX1 = np.add.outer(np.arange(n1 + 1), np.arange(n2 + 1))
        self._H1 = self.hyp1[np.arange(n1 + 1)[:, None], IDX1]
        self._IDX1 = IDX1
        IDX2 = np.add.outer(np.arange(n1 + 2), np.arange(n2 + 1))
        valid = (IDX2 >= 1) & (IDX2 <= n1 + n2)
        self._IDX2c = np.clip(IDX2 - 1, 0, n1 + n2 - 1)
        self._H2 = np.where(
            valid, self.hyp2[np.arange(n1 + 2)[:, None], self._IDX2c], 0.0
        )

    # -- public ---------------------------------------------------------
    def compute(self, a1v, a2v, split):
        "(M, a1+1, (n1+1)(a2+1)(n2+1)) branch lengths, floored + corners."
        J = (
            self._together(a1v, a2v, split)
            if self.a1 == 2
            else self._apart(a1v, a2v, split)
        )
        n1, n2, a1, a2 = self.n1, self.n2, self.a1, self.a2
        J = jnp.maximum(J, 1e-20)
        v = J.reshape(self.M, a1 + 1, n1 + 1, a2 + 1, n2 + 1)
        v = v.at[:, 0, 0, 0, 0].set(0.0)
        v = v.at[:, a1, n1, a2, n2].set(0.0)
        return v.reshape(self.M, a1 + 1, (n1 + 1) * (a2 + 1) * (n2 + 1))

    # -- together (a1 = 2, a2 = 0): jcsfs.cpp:370-420 -------------------
    def _together(self, a1v, a2v, split):
        n1, n2, M = self.n1, self.n2, self.M
        eta1 = _TracedEta(a1v, self.s1)
        eta2 = _TracedEta(a2v, self.s2)
        Rts1 = eta1.R(split)
        Rts2 = eta2.R(split)
        eMn2 = _expm_at(_moran(n2), Rts2)

        # straddle weights: w_m = P(T > split | T in interval m)
        hs_fin = np.where(np.isinf(self.hs), 1.0, self.hs)
        ex = jnp.where(
            jnp.asarray(np.isinf(self.hs)), 0.0, jnp.exp(-eta1.R(hs_fin))
        )  # (M+1,)
        e_split = jnp.exp(-Rts1)
        denom = ex[:-1] - ex[1:]
        w_raw = jnp.clip(
            (e_split - ex[1:]) / jnp.where(denom > 1e-300, denom, 1.0),
            0.0, 1.0,
        )
        # zero-mass intervals: weight by position of the interval start
        w = jnp.where(denom > 1e-300, w_raw,
                      (jnp.asarray(self.hs[:-1]) >= split).astype(ex.dtype))
        bmask = jnp.asarray(self.hs[:-1]) < split  # below part exists
        amask = jnp.asarray(self.hs[1:]) > split  # above part exists
        wbm = jnp.where(bmask, 1.0 - w, 0.0)  # (M,)
        wam = jnp.where(amask, w, 0.0)

        v = jnp.zeros((M, 3, n1 + 1, n2 + 1))

        # ---- below the split (jcsfs.cpp:89-164), all intervals at once
        a_t, g_t = trunc_dual(self.part1, a1v, split, include_crash=False)
        cb = _csfs(a_t, g_t, n1)  # (M, 3, n1+1); garbage rows where !bmask
        cb = jnp.where(bmask[:, None, None],
                       jnp.nan_to_num(jnp.maximum(cb, 0.0)), 0.0)
        v = v.at[:, :, :, 0].add(wbm[:, None, None] * cb)
        trunc_sfs = cb.reshape(M, -1) @ jnp.asarray(self._U_n1).T  # (M, n1+1)
        Et = trunc_sfs @ jnp.asarray(self.Sn1)
        # the reference *assigns* (split - Et) to the (2, n1) corner,
        # overwriting the truncated-CSFS value (jcsfs.py note)
        v = v.at[:, 2, n1, 0].add(wbm * ((split - Et) - cb[:, 2, n1]))

        # above-split SFS transported down (shared across intervals)
        a_sh1, g_sh1 = shift_dual(self.part1_single, a1v, split)
        sfs_above = (
            jnp.asarray(self._U_n12m1)
            @ _csfs(a_sh1, g_sh1, n1 + n2 - 1)[0].reshape(-1)
        )  # (n1+n2,)
        G2 = jnp.asarray(self._H2) * sfs_above[self._IDX2c]  # (n1+2, n2+1)

        # per-interval Gauss-Legendre transports over (t1, min(t2, split))
        lo_u = jnp.maximum(ex[1:], e_split)  # (M,)
        hi_u = ex[:-1]
        span = jnp.clip(hi_u - lo_u, 0.0, None)
        uu = lo_u[:, None] + jnp.asarray(self.quad_u)[None, :] * span[:, None]
        uu = jnp.clip(uu, 1e-300, 1.0)
        Rt = -jnp.log(uu)  # (M, K)
        tq = jnp.clip(Rts1 - Rt, 0.0, None)
        A = _expm_at(_moran(n1 + 1), tq)  # (M, K, n1+2, n1+2)
        B = _expm_at(_modified(n1, 0, 2), Rt)  # (M, K, n1+1, n1+1)
        Cm = _expm_at(_modified(n1, 2, 2), Rt)
        A0 = (A * jnp.asarray(self.S0)[None, None, None, :])[..., :-1]
        A2 = (A * jnp.asarray(self.S2)[None, None, None, :])[..., 1:]
        wq = jnp.asarray(self.quad_w)
        eMn10 = jnp.einsum("q,mqij,mqjl->mil", wq, A0, B)  # (M, n1+2, n1+1)
        eMn12 = jnp.einsum("q,mqij,mqjl->mil", wq, A2, Cm)
        blk0 = jnp.einsum("mij,ik,kl->mjl", eMn10, G2, eMn2)
        blk2 = jnp.einsum("mij,ik,kl->mjl", eMn12, G2, eMn2)
        wb3 = wbm[:, None, None]
        v = v.at[:, 0].add(wb3 * jnp.where(bmask[:, None, None],
                                           jnp.nan_to_num(blk0), 0.0))
        v = v.at[:, 2].add(wb3 * jnp.where(bmask[:, None, None],
                                           jnp.nan_to_num(blk2), 0.0))

        # ---- above the split (jcsfs.cpp:166-216), all intervals at once
        a_sh, g_sh = shift_dual(self.part1, a1v, split)
        rsfs = _csfs(a_sh, g_sh, n1 + n2)  # (M, 3, n1+n2+1)
        rsfs = jnp.where(amask[:, None, None], jnp.nan_to_num(rsfs), 0.0)
        eMn1 = [
            _expm_at(_modified(n1, 0, 2), Rts1),
            _expm_at(_modified(n1, 1, 2), Rts1),
        ]
        eMn1.append(eMn1[0][::-1, ::-1])
        H1 = jnp.asarray(self._H1)
        wa3 = wam[:, None, None]
        for i in range(3):
            Gm = H1[None] * rsfs[:, i, :][:, self._IDX1]  # (M, n1+1, n2+1)
            v = v.at[:, i].add(
                wa3 * jnp.einsum("ij,mik,kl->mjl", eMn1[i], Gm, eMn2)
            )
        # pop 1 below, conditioned on coalescence at the split
        tb0 = _tb0_traced(eta1, split, n1)
        mc = exact.cached_matrices(n1)
        r0 = jnp.maximum(tb0 @ jnp.asarray(mc.M0, jnp.float64), 0.0)  # (n1,)
        r1 = jnp.maximum(tb0 @ jnp.asarray(mc.M1, jnp.float64), 0.0)
        v = v.at[:, 0, 1:, 0].add(wam[:, None] * r0[None, :])
        v = v.at[:, 1, :, 0].add(wam[:, None] * r1[None, :])

        # ---- pop 2 below the split (jcsfs.cpp:403-418), same for all m
        if n2 == 1:
            v = v.at[:, 0, 0, 1].add(split)
        elif n2 > 1:
            a_t2, g_t2 = trunc_dual(self.part2_single, a2v, split,
                                    include_crash=True)
            rsfs2 = (
                jnp.asarray(self._U_n2m2)
                @ _csfs(a_t2, g_t2, n2 - 2)[0].reshape(-1)
            )[: n2 - 1]
            v = v.at[:, 0, 0, 1:n2].add(rsfs2[None, :])
            Sn2 = np.arange(1, n2) / n2
            v = v.at[:, 0, 0, n2].add(split - jnp.asarray(Sn2) @ rsfs2)
        return v.reshape(self.M, 3, (n1 + 1) * (n2 + 1))

    # -- apart (a1 = a2 = 1): jcsfs.cpp:257-367 --------------------------
    def _apart(self, a1v, a2v, split):
        n1, n2, M = self.n1, self.n2, self.M
        eta1 = _TracedEta(a1v, self.s1)
        eta2 = _TracedEta(a2v, self.s2)
        Rts1 = eta1.R(split)
        Rts2 = eta2.R(split)
        # the distinguished pair cannot coalesce below the split: only
        # intervals reaching above it carry conditional mass
        amask = jnp.asarray(self.hs[1:]) > split  # (M,)

        a_sh, g_sh = shift_dual(self.part1, a1v, split)
        cs = _csfs(a_sh, g_sh, n1 + n2)  # (M, 3, n1+n2+1)
        cs = jnp.where(amask[:, None, None], jnp.nan_to_num(cs), 0.0)

        T10 = _expm_at(_modified(n1, 0, 1), Rts1)
        T11 = _expm_at(_modified(n1, 1, 1), Rts1)
        T20 = _expm_at(_modified(n2, 0, 1), Rts2)
        T21 = _expm_at(_modified(n2, 1, 1), Rts2)
        H1 = jnp.asarray(self._H1)
        v = jnp.zeros((M, 2, n1 + 1, 2, n2 + 1))
        for (r0, r1), (Ma, Mb, fac) in {
            (1, 1): (T11, T21, 1.0),
            (1, 0): (T11, T20, 0.5),
            (0, 1): (T10, T21, 0.5),
            (0, 0): (T10, T20, 1.0),
        }.items():
            csrow = {(1, 1): 2, (1, 0): 1, (0, 1): 1, (0, 0): 0}[(r0, r1)]
            Gm = H1[None] * cs[:, csrow, :][:, self._IDX1]
            v = v.at[:, r0, :, r1, :].add(
                fac * jnp.einsum("ij,mik,kl->mjl", Ma, Gm, Mb)
            )

        # truncated below-split SFS per population (jcsfs.cpp:320-367);
        # added to every interval.  split == 0 degrades gracefully: the
        # truncated model is crash-only, its branch lengths ~ 0.
        for first, (av, ni, part, U) in enumerate(
            [
                (a1v, n1, self.part1_single,
                 getattr(self, "_U_n1m1", None)),
                (a2v, n2, self.part2_single,
                 getattr(self, "_U_n2m1", None)),
            ]
        ):
            if ni == 0:
                continue
            a_t, g_t = trunc_dual(part, av, split, include_crash=True)
            rsfs = (
                jnp.asarray(U) @ _csfs(a_t, g_t, ni - 1)[0].reshape(-1)
            )[:ni]
            ks = np.arange(1, ni + 1)
            fac = ks / (ni + 1.0)
            x1 = (1.0 - fac) * rsfs
            x2 = fac * rsfs
            if first == 0:
                v = v.at[:, 0, 1:, 0, 0].add(x1[None, :])
                v = v.at[:, 1, :ni, 0, 0].add(x2[None, :])
            else:
                v = v.at[:, 0, 0, 0, 1:].add(x1[None, :])
                v = v.at[:, 0, 0, 1, :ni].add(x2[None, :])
            remain = jnp.asarray(ks, jnp.float64) @ rsfs / (ni + 1.0)
            if first == 0:
                v = v.at[:, 1, ni, 0, 0].add(split - remain)
            else:
                v = v.at[:, 0, 0, 1, ni].add(split - remain)
        return v.reshape(self.M, 2, (n1 + 1) * 2 * (n2 + 1))
