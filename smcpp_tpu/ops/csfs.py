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


def conditioned_sfs(a, grid: TimeGrid, n: int, xp=jnp, dtype=None):
    """CSFS branch lengths, shape (M, 3, n+1).

    Row a' in {0,1,2} = derived-allele count in the distinguished pair,
    column b in {0..n} = derived count among the undistinguished lineages.

    ``dtype=np.longdouble`` (NumPy path only) runs the whole pipeline —
    exact-matrix conversion, tjj integrals, spectral contractions — in
    80-bit precision, extending the large-n accuracy envelope from
    n ~ 60 to n ~ 75+ (see tests/test_csfs.py::test_csfs_large_n_envelope).
    """
    if dtype is not None:
        assert xp is np, "high-precision path is NumPy-only"
        mc = exact.cached_matrices_hp(n)
        mei = exact.moran_eigensystem_hp(n)
        a = np.asarray(a, dtype=dtype)
    else:
        mc = exact.cached_matrices(n)
        mei = exact.moran_eigensystem(n)

    # ---- below part (conditioned_sfs.cpp:12-39)
    tb = ratefunc.tjj_below(a, grid, n, xp)  # (M, n+1)
    row0_below = tb @ mc.M0  # (M, n) -> goes in [0, 1:]
    row1_below = tb @ mc.M1  # (M, n+1) -> row 1

    # ---- above part (conditioned_sfs.cpp:41-83)
    C = ratefunc.tjj_above(a, grid, n, xp)  # (M, n+1, n); axes (h, jj-2, j-2)
    # tmp0[h, k] = sum_i X0[i, k] * C[h, k, i]   (eigen index k pairs with jj)
    tmp0 = xp.einsum("ik,hki->hk", mc.X0, C)
    # tmp2 pairs X2 with the eigen-reversed C
    Cf = C[:, ::-1, :]
    tmp2 = xp.einsum("ik,hki->hk", mc.X2, Cf)
    Uinv_mp0 = mei.Uinv[:, 1:]  # rightCols(n), (n+1, n)
    Uinv_rev = mei.Uinv[::-1, ::-1]
    Uinv_mp2 = Uinv_rev[:, :n]  # (n+1, n)
    row0_above = tmp0 @ Uinv_mp0  # (M, n) -> [0, 1:]
    row2_above = tmp2 @ Uinv_mp2  # (M, n) -> [2, :n]

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
