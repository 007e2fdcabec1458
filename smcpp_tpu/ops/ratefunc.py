"""Jittable piecewise-constant coalescent rate function.

All functions are pure, fixed-shape functions of the traced per-piece
population-size vector ``a`` (everything else — the time grid, hidden-state
indices, sample size — is static).  They reproduce the closed-form integrals
of the reference implementation
(/root/reference/src/piecewise_constant_rate_function.cpp) in a fully
vectorized, branch-free form:

* the terminal infinite piece is represented by a finite width ``BIG_T`` so
  that every "t == infinity" special case collapses to the correct limit
  automatically (exp(-ada*BIG_T) == 0.0 exactly in float64);
* the inner sums over pieces ("single integrals") are computed with
  prefix/suffix log-sum-exp so that large positive exponents in the
  divided-out coefficients can never overflow (this replaces the reference's
  branchy magnitude-20 cutoffs at
  piecewise_constant_rate_function.cpp:262-287);
* zero-width pieces (which occur for degenerate warm-start models) are
  masked statically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import defaults
from .grid import TimeGrid


def nC2(v):
    v = np.asarray(v)
    return v * (v - 1) // 2


def ada_on_grid(a, grid: TimeGrid):
    "Per-augmented-piece inverse population size (the coalescent rate)."
    return (1.0 / a)[grid.src]


def cumulative_rate(ada, grid: TimeGrid, xp=jnp):
    """R(ts[i]) for every grid point i (K+1 values).

    The last entry is a huge-but-finite number standing in for R(inf).
    """
    return xp.concatenate([xp.zeros(1, ada.dtype), xp.cumsum(ada * grid.dt)])


def _log_denoms(Rr, grid: TimeGrid, xp=jnp):
    """log P(coal in hidden interval h) for each h — with a leading -R_h shift.

    Matches ``log_denom`` of the reference (= -R_h + log(-expm1(-(R_h1-R_h)))):
    exp(-log_denom[h]) == 1 / (e^{-R_h} - e^{-R_h1}).
    """
    Rh = Rr[grid.hs_indices[:-1]]
    Rh1 = Rr[grid.hs_indices[1:]]
    dR = Rh1 - Rh
    # log(-expm1(-x)), stable in both regimes; dR can be huge (terminal piece)
    log1mexp = xp.where(
        dR > 0.6931471805599453,
        xp.log1p(-xp.exp(-xp.minimum(dR, 700.0))),
        xp.log(-xp.expm1(-xp.maximum(dR, 1e-300))),
    )
    return -Rh + log1mexp


def initial_distribution(a, grid: TimeGrid):
    """pi_m = e^{-R(h_m)} - e^{-R(h_{m+1})}, floored and normalized.

    Reference: src/inference_manager.cpp:56-69.
    """
    ada = ada_on_grid(a, grid)
    Rr = cumulative_rate(ada, grid)
    ex = jnp.exp(-Rr[grid.hs_indices])
    pi = ex[:-1] - ex[1:]
    pi = jnp.maximum(pi, defaults.pi_floor)
    return pi / jnp.sum(pi)


def average_coal_times(a, grid: TimeGrid):
    """E[T | coal in hidden interval h] for each h.

    e_coal = t0 e^{-R(t0)} - t1 e^{-R(t1)} + int_{t0}^{t1} e^{-R}, all divided
    by interval probability.  Reference:
    piecewise_constant_rate_function.cpp:371-403.
    """
    ada = ada_on_grid(a, grid)
    Rr = cumulative_rate(ada, grid)
    ld = _log_denoms(Rr, grid)  # (M,)

    # int e^{-R} over each piece
    zero_piece = grid.dt <= 0.0
    piece_int = jnp.exp(-Rr[:-1]) * (-jnp.expm1(-ada * grid.dt)) / ada
    piece_int = jnp.where(zero_piece, 0.0, piece_int)
    # segment-sum pieces into hidden intervals, with the per-interval
    # 1/P(interval) factor exp(-ld) folded in
    h_of_m = grid.interval_of_piece  # static, clipped; invalid pieces masked by seg
    seg = grid.segment_matrix()
    integral = seg @ (piece_int * jnp.exp(-ld[h_of_m]))

    hs = grid.hidden_states
    t0 = hs[:-1]
    t1 = np.where(np.isinf(hs[1:]), 0.0, hs[1:])  # static mask; inf term -> 0
    R0 = Rr[grid.hs_indices[:-1]]
    R1 = Rr[grid.hs_indices[1:]]
    x = t0 * jnp.exp(-(R0 + ld)) + integral - t1 * jnp.exp(-(R1 + ld))
    # Intervals with zero coalescent mass (infinite size in split models)
    # are undefined; mirror the reference's NaN convention.
    dR = R1 - R0
    return jnp.where(dR > 0, x, jnp.nan)


def _log_single_integrals(rates, ada, Rr, grid: TimeGrid, xp=jnp):
    """log of int_{ts_k}^{ts_{k+1}} exp(-rate * R(t)) dt per (rate, piece).

    rates: static numpy int array (R,).  Returns (R, K).
    Reference closed form: piecewise_constant_rate_function.cpp:197-211.
    """
    # static constants follow the working dtype (an f64 np array would
    # silently promote an f32 setup program back to f64 under x64)
    fdt = np.dtype(getattr(ada, "dtype", np.float64))
    rates = np.asarray(rates, dtype=fdt)[:, None]  # (R,1)
    # rate == 0 rows take the log(dt) branch below; keep the main formula
    # NaN-free for them (log/0-division otherwise poisons the gradient).
    rates_safe = np.where(rates == 0, 1.0, rates)
    zero_piece = (grid.dt <= 0.0)[None, :]
    x = rates_safe * ada[None, :] * grid.dt[None, :]  # (R,K), > 0
    x_safe = xp.where(zero_piece, 1.0, x)
    log1mexp = xp.where(
        x_safe > 0.6931471805599453,
        xp.log1p(-xp.exp(-xp.minimum(x_safe, 700.0))),
        xp.log(-xp.expm1(-x_safe)),
    )
    log_si = -rates * Rr[None, :-1] + log1mexp - xp.log(ada[None, :] * rates_safe)
    # rate == 0: integral is just the piece width.  (xp-generic so that
    # traced-dt grids — the split objective's padded truncate/shift grids,
    # ops/split_objective.py — trace through; for the static production
    # grids this constant-folds identically.)
    log_si = xp.where(
        rates == 0, xp.log(xp.maximum(grid.dt, 1e-300))[None, :], log_si
    )
    return xp.where(zero_piece, -np.inf, log_si)


def _cumlse(x, xp):
    if xp is np:
        return np.logaddexp.accumulate(x, axis=1)
    return jax.lax.cumlogsumexp(x, axis=1)


def _suffix_lse(log_si, xp=jnp):
    "logsumexp over pieces strictly after k, shape-preserving.  (R,K) -> (R,K)"
    rev = log_si[:, ::-1]
    c = _cumlse(rev, xp)[:, ::-1]
    # exclusive: shift left; last entry has empty suffix
    return xp.concatenate([c[:, 1:], xp.full_like(c[:, :1], -np.inf)], axis=1)


def _prefix_lse(log_si, xp=jnp):
    "logsumexp over pieces strictly before k.  (R,K) -> (R,K)"
    c = _cumlse(log_si, xp)
    return xp.concatenate([xp.full_like(c[:, :1], -np.inf), c[:, :-1]], axis=1)


def tjj_below(a, grid: TimeGrid, n: int, xp=jnp):
    """Double integrals "below": (M, n+1) matrix of
    E[int_0^T exp(-rate_j * R(t)) dt | T in interval h] branch-length moments,
    rate_j = C(j,2)-1 for j = 2..n+2.

    Reference: piecewise_constant_rate_function.cpp:301-334.
    """
    ada = ada_on_grid(a, grid)
    Rr = cumulative_rate(ada, grid, xp)
    ld = _log_denoms(Rr, grid, xp)
    h_of_m = grid.interval_of_piece
    ld_m = ld[h_of_m]  # (K,)

    js = np.arange(2, n + 3)
    rates = nC2(js) - 1  # (n+1,), first entry 0
    fdt = np.dtype(getattr(ada, "dtype", np.float64))
    ratesf = rates.astype(fdt)[:, None]  # (R,1)

    Rm = Rr[:-1][None, :]
    ad = (ada * grid.dt)[None, :]  # (1,K) broadcast; huge on last piece
    zero_piece = (grid.dt <= 0.0)[None, :]
    adaK = ada[None, :]

    l1r = 1.0 + ratesf
    coef = xp.exp(-l1r * Rm - ld_m[None, :])
    # rate > 0 closed form (degrades correctly for ad -> inf)
    v_pos = coef * (xp.expm1(-l1r * ad) / l1r - xp.expm1(-ad)) / (
        np.where(ratesf == 0, 1.0, ratesf) * adaK
    )
    # rate == 0 closed form
    v_zero = xp.exp(-Rm - ld_m[None, :]) * (
        1.0 - xp.exp(-ad) * (1.0 + ad)
    ) / adaK
    dia = xp.where(ratesf == 0, v_zero, v_pos)
    dia = xp.where(zero_piece, 0.0, dia)

    # single-integral part: fac_m * exp(-Rm - ld) * sum_{k<m} si(rate, k)
    log_si = _log_single_integrals(rates, ada, Rr, grid, xp)
    plse = _prefix_lse(log_si, xp)  # (R,K)
    dRm = (Rr[1:] - Rr[:-1])[None, :]
    fac = -xp.expm1(-dRm)  # == 1 automatically on the terminal piece
    term2 = fac * xp.exp(-Rm - ld_m[None, :] + plse)

    total = dia + term2  # (R,K)
    seg = grid.segment_matrix()
    return xp.einsum("hk,rk->hr", seg, total)  # (M, n+1)


def tjj_above(a, grid: TimeGrid, n: int, xp=jnp):
    """Double integrals "above": (M, n+1, n) tensor C with
    C[h, jj-2, j-2], jj = 2..n+2 (Moran eigen-rate lam = C(jj,2)-1),
    j = 2..n+1 (coalescent rate C(j,2)).

    Reference: piecewise_constant_rate_function.cpp:213-299.
    """
    ada = ada_on_grid(a, grid)
    Rr = cumulative_rate(ada, grid, xp)
    ld = _log_denoms(Rr, grid, xp)
    h_of_m = grid.interval_of_piece
    ld_m = ld[h_of_m]

    jjs = np.arange(2, n + 3)  # (JJ,) = n+1
    js = np.arange(2, n + 2)  # (J,) = n
    fdt = np.dtype(getattr(ada, "dtype", np.float64))
    l1 = nC2(jjs).astype(fdt)[:, None, None]  # lam + 1, (JJ,1,1)
    r = nC2(js).astype(fdt)[None, :, None]  # (1,J,1)

    Rm = Rr[:-1][None, None, :]
    Rm1 = Rr[1:][None, None, :]
    ad = (ada * grid.dt)[None, None, :]
    adaK = ada[None, None, :]
    zero_piece = (grid.dt <= 0.0)[None, None, :]

    coef = xp.exp(-l1 * Rm - ld_m[None, None, :])
    eq = l1 == r  # static (JJ,J,1)
    denom_lr = np.where(l1 - r == 0, 1.0, l1 - r)  # static safe denominator
    # |l1 - r| with a static positive floor: keeps the unselected branches of
    # the where() below free of expm1(+inf) = inf (whose 0*inf would poison
    # gradients through the select).
    abs_lr = np.where(l1 == r, 1.0, np.abs(l1 - r))

    # The ONLY full-rank (JJ,J,K) transcendental.  It is shared between the
    # diagonal part below and term2 (R_{m+1} - R_m == ada*dt == ad by
    # construction of cumulative_rate, so expm1(-|rp|*dR) is this same
    # tensor) — every other exp() here is factored to (JJ,1,K)/(1,J,K)
    # rank so the (JJ,J,K) work is multiplies, not transcendentals
    # (~3x fewer exp calls; this is the M-step's hot op).
    em1 = xp.expm1(-abs_lr * ad)

    # l1 == rate
    v_eq = coef * (1.0 - xp.exp(-r * ad) * (1.0 + r * ad)) / (r * r) / adaK
    # rate < l1
    v_lt = -coef * (
        xp.expm1(-l1 * ad) / l1 + xp.exp(-r * ad) * (-em1) / denom_lr
    ) / (r * adaK)
    # rate > l1
    v_gt = -coef * (
        xp.expm1(-l1 * ad) / l1 + xp.exp(-l1 * ad) * em1 / denom_lr
    ) / (r * adaK)
    dia = xp.where(eq, v_eq, xp.where(r < l1, v_lt, v_gt))
    dia = xp.where(zero_piece, 0.0, dia)

    # single-integral part.  rp = l1 - rate;
    #   rp == 0: ad * exp(-ld + suffix)
    #   rp != 0: exp(-rp * pivotR - ld + suffix) * (-expm1(-|rp| ad)) / |rp|
    # where suffix = logsumexp_{k>m} log si(rate, k), pivotR = Rm (rp > 0)
    # or Rm1 (rp < 0).  The exponent splits by rank:
    #   -rp*pivotR - ld + suffix = [-l1*pivotR - ld] + [r*pivotR + suffix]
    # with the first bracket (JJ,1,K) (== log coef / log coef1) and the
    # second (1,J,K).  The (1,J,K) bracket is bounded above by
    # log(sum of piece widths) — si decays at least as fast as
    # exp(-r*R(t)) past pivotR — so its exp cannot overflow, and the
    # product saturates exactly where the fused exp would underflow.
    log_si = _log_single_integrals(nC2(js), ada, Rr, grid, xp)  # (J,K)
    slse = _suffix_lse(log_si, xp)[None, :, :]  # (1,J,K)

    rp = l1 - r  # (JJ,J,1) static values
    coef1 = xp.exp(-l1 * Rm1 - ld_m[None, None, :])  # (JJ,1,K)
    E0 = xp.exp(r * Rm + slse)  # (1,J,K)
    E1 = xp.exp(r * Rm1 + slse)  # (1,J,K)
    t_ne = xp.where(rp > 0, coef * E0, coef1 * E1) * (-em1) / abs_lr
    t_eq = ad * xp.exp(-ld_m[None, None, :] + slse)
    term2 = xp.where(rp == 0, t_eq, t_ne)

    total = dia + term2  # (JJ,J,K)
    seg = grid.segment_matrix()
    return xp.einsum("hk,ijk->hij", seg, total)  # (M, JJ, J)


# ---------------------------------------------------------------------------
# Host-side (NumPy) utilities on raw (a, s) models — used for hidden-state
# balancing and other root-finding that happens outside of jit.
# ---------------------------------------------------------------------------

class HostRateFunction:
    "Plain NumPy piecewise-constant rate function (no hidden-state splicing)."

    def __init__(self, a, s):
        self.a = np.asarray(a, dtype=np.float64)
        self.ada = 1.0 / self.a
        self.s = np.asarray(s, dtype=np.float64)
        self.ts = np.concatenate([[0.0], np.cumsum(self.s)])
        self.ts[-1] = np.inf
        self.Rrng = np.concatenate(
            [[0.0], np.cumsum(self.ada[:-1] * np.diff(self.ts[:-1]))]
        )

    def R(self, t):
        "Cumulative hazard at time t (scalar or array)."
        t = np.atleast_1d(np.asarray(t, dtype=np.float64))
        ip = np.minimum(
            np.searchsorted(self.ts, t, side="right") - 1, len(self.ada) - 1
        )
        out = self.Rrng[ip] + self.ada[ip] * (t - self.ts[ip])
        return out if out.size > 1 else out[0]

    def Rinv(self, y):
        "Inverse of R."
        y = np.atleast_1d(np.asarray(y, dtype=np.float64))
        ip = np.minimum(
            np.searchsorted(self.Rrng, y, side="right") - 1, len(self.ada) - 1
        )
        out = (y - self.Rrng[ip]) / self.ada[ip] + self.ts[ip]
        return out if out.size > 1 else out[0]
