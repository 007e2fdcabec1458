"""Feasibility proof for the cancellation-free large-n CSFS reformulation
(docs/ROADMAP.md item 6).

The CSFS "above" pipeline needs weighted time integrals of the Moran
semigroup, which the current implementation (like the reference,
conditioned_sfs.cpp) evaluates through the exact eigendecomposition —
numerically fatal past n ~ 60 because U/Uinv have ~1e20 alternating
entries.  The same integrals are resolvent actions:

    int_0^inf exp(Q t) e^{-r t} dt  =  (r I - Q)^{-1}

and Q (the modified Moran rate matrix) is TRIDIAGONAL, so each action is
an O(n) banded solve on a diagonally-dominant M-matrix — stable at any n.
These tests pin both halves of the argument:

1. the identity itself (quadrature oracle at small n);
2. conditioning at large n: the banded state-basis solve keeps
   ~machine-precision residuals, while the eigen-coordinate
   representation used today carries a max|Uinv| ~ 1e44 amplification
   factor at n=150 (the mechanism behind the measured n ~ 60 envelope).
"""

import numpy as np
import scipy.linalg

from smcpp_tpu.ops import exact


def _moran_dense(n):
    sub, dia, sup = exact._modified_moran_rate_matrix(n, 0, 2)
    Q = np.zeros((n + 1, n + 1))
    for i in range(n + 1):
        Q[i, i] = float(dia[i])
        if i > 0:
            Q[i, i - 1] = float(sub[i])
        if i < n:
            Q[i, i + 1] = float(sup[i])
    return Q


def _moran_banded(n):
    "ab matrix for scipy.linalg.solve_banded of (r I - Q)."
    sub, dia, sup = exact._modified_moran_rate_matrix(n, 0, 2)
    ab = np.zeros((3, n + 1))
    ab[0, 1:] = [-float(x) for x in sup[:-1]]  # superdiagonal of -Q
    ab[1, :] = [-float(x) for x in dia]
    ab[2, :-1] = [-float(x) for x in sub[1:]]
    return ab


def test_resolvent_identity_small_n():
    "(r I - Q)^{-1} == int_0^inf exp(Q t) e^{-rt} dt (quadrature, n=8)."
    import scipy.integrate

    n, r = 8, 7.0
    Q = _moran_dense(n)
    R = np.linalg.solve(r * np.eye(n + 1) - Q, np.eye(n + 1))
    v = np.zeros(n + 1)
    v[3] = 1.0
    got = R @ v

    def integrand(t):
        return scipy.linalg.expm(Q * t) @ v * np.exp(-r * t)

    quad = np.zeros(n + 1)
    for i in range(n + 1):
        quad[i], _ = scipy.integrate.quad(
            lambda t, i=i: integrand(t)[i], 0, 50, limit=200
        )
    np.testing.assert_allclose(got, quad, rtol=1e-8, atol=1e-12)


def test_resolvent_conditioning_large_n():
    """n = 150: the banded state-basis solve of (r I - Q) x = v keeps a
    ~machine-epsilon residual and a nonnegative (M-matrix) solution — the
    stable building block for the reformulated pipeline.  By contrast the
    eigen-coordinate representation the current pipeline passes through is
    intrinsically explosive: max |Uinv| grows from ~1e14 at n=50 to ~1e44
    at n=150, so ANY f64 rounding of the quantities contracted against
    Uinv (here: the tjj double integrals) is amplified into the final
    CSFS — the measured n ~ 60 breakdown of
    test_csfs.py::test_csfs_large_n_envelope.  The fix must therefore
    stay in the state basis end-to-end (resolvent actions per piece,
    semigroup actions by uniformization), never forming eigen-coordinates."""
    n, r = 150, 10.0
    ab = _moran_banded(n)
    ab[1, :] += r  # (r I - Q) bands
    rng = np.random.RandomState(0)
    v = rng.dirichlet(np.ones(n + 1))
    x = scipy.linalg.solve_banded((1, 1), ab, v)

    Q = _moran_dense(n)
    A = r * np.eye(n + 1) - Q
    resid = np.linalg.norm(A @ x - v) / np.linalg.norm(v)
    assert resid < 1e-12, resid
    # an M-matrix resolvent of a probability-ish vector stays nonnegative
    assert x.min() > -1e-12

    # the eigen-coordinate amplification factor the reformulation removes
    assert np.abs(exact.moran_eigensystem(50).Uinv).max() > 1e13
    assert np.abs(exact.moran_eigensystem(n).Uinv).max() > 1e40
