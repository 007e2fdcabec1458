"""Conditioned SFS (one population): expected branch lengths subtending each
(a, b) class, conditioned on the TMRCA of the distinguished pair lying in each
hidden interval.

Combines the device tjj double integrals (ratefunc.py) with the exact
n-dependent matrix cache (exact.py).  Reference:
/root/reference/src/conditioned_sfs.cpp.
"""

import jax.numpy as jnp
import numpy as np

from .. import defaults
from . import exact, ratefunc
from .grid import TimeGrid


def conditioned_sfs(a, grid: TimeGrid, n: int, xp=jnp):
    """CSFS branch lengths, shape (M, 3, n+1).

    Row a' in {0,1,2} = derived-allele count in the distinguished pair,
    column b in {0..n} = derived count among the undistinguished lineages.

    The above contraction runs in the stable symmetrized eigenbasis of
    the irreducible Moran block (exact.stable_eigensystem): every constant
    factor is O(n)-bounded, so plain f64 keeps ~1e-13 relative accuracy
    at n = 200 where the reference's compensated-summation pipeline
    (conditioned_sfs.cpp:41-83) has long since broken down.
    """
    mc = exact.cached_matrices(n)
    # constants follow the working dtype (f64 np arrays would promote an
    # f32 setup program back to f64 under x64)
    fdt = np.dtype(getattr(a, "dtype", np.float64))
    M0, M1 = mc.M0.astype(fdt), mc.M1.astype(fdt)
    X0, X2 = mc.X0.astype(fdt), mc.X2.astype(fdt)
    Uinv0, Uinv2 = mc.Uinv0.astype(fdt), mc.Uinv2.astype(fdt)

    # ---- below part (conditioned_sfs.cpp:12-39)
    tb = ratefunc.tjj_below(a, grid, n, xp)  # (M, n+1)
    row0_below = tb @ M0  # (M, n) -> goes in [0, 1:]
    row1_below = tb @ M1  # (M, n+1) -> row 1

    # ---- above part (conditioned_sfs.cpp:41-83)
    C = ratefunc.tjj_above(a, grid, n, xp)  # (M, n+1, n); axes (h, jj-2, j-2)
    Ct = C[:, 1:, :]  # drop jj=2 (lambda = 0): it never reaches states >= 1
    # tmp[h, k] = sum_i X[i, k] * Ct[h, k, i]  (eigen index k = 3..n+2)
    tmp0 = xp.einsum("ik,hki->hk", X0, Ct)
    tmp2 = xp.einsum("ik,hki->hk", X2, Ct)
    row0_above = tmp0 @ Uinv0  # (M, n) -> [0, 1:]
    row2_above = tmp2 @ Uinv2  # (M, n) -> [2, :n]

    M = grid.M
    if xp is not jnp:
        out = np.zeros((M, 3, n + 1), dtype=row1_below.dtype)
        out[:, 0, 1:] = row0_below + row0_above
        out[:, 1, :] = row1_below
        out[:, 2, :n] = row2_above
        return out
    out = jnp.zeros((M, 3, n + 1), dtype=tb.dtype)
    out = out.at[:, 0, 1:].set(row0_below + row0_above)
    out = out.at[:, 1, :].set(row1_below)
    out = out.at[:, 2, :n].set(row2_above)
    return out


def incorporate_theta(csfs, theta):
    """Convert branch lengths to per-site emission probabilities.

    ret = csfs * (-expm1(-theta * tauh)) / tauh with the (0,0) "no mutation"
    entry completing the distribution; entries floored at 1e-10.
    Reference: conditioned_sfs.cpp:99-148.
    """
    tauh = jnp.sum(csfs, axis=(1, 2), keepdims=True)  # (M,1,1)
    ret = csfs * (-jnp.expm1(-theta * tauh)) / tauh
    total = jnp.sum(ret, axis=(1, 2))
    ret = ret.at[:, 0, 0].set(1.0 - total)
    return jnp.maximum(ret, defaults.emission_floor)
