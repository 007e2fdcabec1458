"""Exact rational Moran eigensystem and combinatorial matrix cache (host side).

These quantities depend only on the sample size ``n`` — never on model
parameters — so they are computed once per ``n`` in exact rational arithmetic
(Python ``fractions.Fraction`` replaces the reference's GMP ``mpq_class``),
converted to float64 and cached on disk.  Reference:
/root/reference/src/moran_eigensystem.cpp and /root/reference/src/matrix_cache.cpp.
"""

import os
from dataclasses import dataclass
from fractions import Fraction
from functools import lru_cache
from math import comb

import numpy as np

F0 = Fraction(0)
F1 = Fraction(1)


def _modified_moran_rate_matrix(N, a, na):
    """Tridiagonal rate matrix of the Moran model with ``a`` of ``na``
    distinguished lineages carrying the derived allele, as (sub, diag, sup)
    bands of Fractions.  Reference: moran_eigensystem.cpp:31-52."""
    sub = [F0] * (N + 1)  # sub[i] = M[i, i-1]
    sup = [F0] * (N + 1)  # sup[i] = M[i, i+1]
    dia = [F0] * (N + 1)
    for i in range(N + 1):
        sm = F0
        if i > 0:
            b = (na - a) * i + Fraction(i * (N - i), 2)
            sub[i] = b
            sm += b
        if i < N:
            b = a * (N - i) + Fraction(i * (N - i), 2)
            sup[i] = b
            sm += b
        dia[i] = -sm
    return sub, dia, sup


def _solve_tridiag_null(sub, dia, sup, shift, lo=0):
    """Back-substitution solve for the null vector of (M - shift*I) restricted
    to rows/cols [lo, N]: ret[N] = 1, ret[i] = (row i+1 . ret) / -M[i+1, i].

    Reference: moran_eigensystem.cpp:54-64 (rows of a tridiagonal matrix).
    """
    N = len(dia) - 1
    ret = [F0] * (N + 1)
    ret[N] = F1
    for i in range(N - 1, lo - 1, -1):
        # row i+1 of (M - shift I): sub[i+1] at col i, dia[i+1]-shift at i+1,
        # sup[i+1] at col i+2
        acc = (dia[i + 1] - shift) * ret[i + 1]
        if i + 2 <= N:
            acc += sup[i + 1] * ret[i + 2]
        # note ret[i] is the unknown multiplying sub[i+1]
        ret[i] = acc / -(sub[i + 1])
    return ret


@dataclass(frozen=True)
class MoranEigensystem:
    "Exact eigendecomposition of the (0,2)-modified Moran rate matrix, size n."
    U: np.ndarray  # (n+1, n+1) float64
    Uinv: np.ndarray  # (n+1, n+1) float64
    D: np.ndarray  # (n+1,) eigenvalues -(k(k-1)/2 - 1), k = 2..n+2


@lru_cache(maxsize=2)
def _moran_eigensystem_exact(n: int):
    """Exact eigenvectors for the known eigenvalues -(k(k-1)/2 - 1), as
    rational (Fraction) row lists plus the float eigenvalue vector.

    Reference: moran_eigensystem.cpp:67-96.  The transpose solve for Uinv
    swaps the sub/sup bands; the first column of Uinv is completed from the
    first row equation of (M^T - rate I).
    """
    sub, dia, sup = _modified_moran_rate_matrix(n, 0, 2)
    # transpose bands: Mt[i, i-1] = M[i-1, i] = sup[i-1]; Mt[i, i+1] = sub[i+1]
    subT = [F0] + [sup[i - 1] for i in range(1, n + 1)]
    supT = [sub[i + 1] for i in range(n)] + [F0]

    U = [[F0] * (n + 1) for _ in range(n + 1)]
    Uinv = [[F0] * (n + 1) for _ in range(n + 1)]
    D = np.zeros(n + 1)
    Uinv[0][0] = F1
    for k in range(2, n + 3):
        rate = Fraction(-(k * (k - 1) // 2 - 1))
        D[k - 2] = float(rate)
        col = _solve_tridiag_null(sub, dia, sup, rate)
        for i in range(n + 1):
            U[i][k - 2] = col[i]
        if k > 2:
            row = _solve_tridiag_null(subT, dia, supT, rate, lo=1)
            # first entry from row 0 of (Mt - rate I): ret(k-2,0) =
            # -Uinv(k-2,1) * A(0,1) / A(0,0)
            a01 = supT[0]
            a00 = dia[0] - rate
            row[0] = -row[1] * a01 / a00
            Uinv[k - 2] = row

    # normalize: U <- U * diag(1 / diag(Uinv @ U))
    for k in range(n + 1):
        d = sum(Uinv[k][i] * U[i][k] for i in range(n + 1))
        inv = F1 / d
        for i in range(n + 1):
            U[i][k] *= inv
    return U, Uinv, D


@lru_cache(maxsize=None)
def moran_eigensystem(n: int) -> MoranEigensystem:
    U, Uinv, D = _moran_eigensystem_exact(n)
    return MoranEigensystem(
        U=_frac_array(U, np.float64), Uinv=_frac_array(Uinv, np.float64), D=D
    )


@lru_cache(maxsize=4)
def moran_eigensystem_hp(n: int) -> MoranEigensystem:
    "Long-double conversion of the exact eigensystem (large-n CSFS path)."
    U, Uinv, D = _moran_eigensystem_exact(n)
    return MoranEigensystem(
        U=_frac_array(U, np.longdouble),
        Uinv=_frac_array(Uinv, np.longdouble),
        D=D.astype(np.longdouble),
    )


# ---------------------------------------------------------------------------
# Combinatorial matrices (Polanski-Kimmel weights, lineage-size pmfs,
# below-coefficients recurrence).  Reference: matrix_cache.cpp:112-282.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _Wnbj(n: int, b: int, j: int) -> Fraction:
    "Polanski-Kimmel weights W_{n,b,j} (matrix_cache.cpp:148-171)."
    if j == 2:
        return Fraction(6, n + 1)
    if j == 3:
        if n == 2 * b:
            return F0
        return Fraction(30 * (n - 2 * b), (n + 1) * (n + 2))
    jj = j - 2
    c1 = Fraction(-(1 + jj) * (3 + 2 * jj) * (n - jj), jj * (2 * jj - 1) * (n + jj + 1))
    c2 = Fraction((3 + 2 * jj) * (n - 2 * b), jj * (n + jj + 1))
    return _Wnbj(n, b, jj) * c1 + _Wnbj(n, b, jj + 1) * c2


def _pnkb_dist(n, m, l1):
    "P(distinguished lineage subtends l1 | k=m undistinguished left)."
    return Fraction(comb(n + 2 - l1, m + 1), comb(n + 3, m + 3)) * l1


def _pnkb_undist(n, m, l3):
    "P(undistinguished lineage subtends l3 | k=m undistinguished left)."
    return Fraction(comb(n + 3 - l3, m + 2), comb(n + 3, m + 3))


def _below_coeffs(n):
    "Triangular recurrence for the below-coefficients (matrix_cache.cpp:115-146)."
    mlast = None
    for nn in range(2, n + 3):
        mnew = [[F0] * (nn - 1) for _ in range(n + 1)]
        mnew[nn - 2][nn - 2] = F1
        for k in range(nn - 1, 1, -1):
            denom = (nn + 1) * (nn - 2) - (k + 1) * (k - 2)
            c1 = Fraction((nn + 1) * (nn - 2), denom)
            for i in range(n + 1):
                mnew[i][k - 2] = mlast[i][k - 2] * c1
        for k in range(nn - 1, 1, -1):
            denom = (nn + 1) * (nn - 2) - (k + 1) * (k - 2)
            c2 = Fraction((k + 2) * (k - 1), denom)
            for i in range(n + 1):
                mnew[i][k - 2] -= mnew[i][k - 1] * c2
        mlast = mnew
    return mlast  # (n+1) x (n+1) Fractions


def _frac_to_longdouble(x: Fraction) -> np.longdouble:
    """Fraction -> 80-bit long double, correct to ~1 ulp for any magnitude.

    float(Fraction) would round through float64 (53 bits); here the 64-bit
    mantissa is extracted with integer shifts so the extended precision is
    real.  Used by the high-precision (xp=np, dtype=longdouble) CSFS path."""
    if x == 0:
        return np.longdouble(0.0)
    num, den = x.numerator, x.denominator
    sign = 1.0 if (num < 0) == (den < 0) else -1.0
    num, den = abs(num), abs(den)
    e = num.bit_length() - den.bit_length()
    s = 64 - e
    t = (num << s) // den if s >= 0 else num // (den << -s)
    return np.longdouble(sign) * np.ldexp(np.longdouble(t), e - 64)


def _frac_array(rows, dtype):
    if dtype == np.longdouble:
        return np.array(
            [[_frac_to_longdouble(x) for x in row] for row in rows],
            dtype=np.longdouble,
        )
    return np.array([[float(x) for x in row] for row in rows])


@dataclass(frozen=True)
class MatrixCache:
    X0: np.ndarray  # (n, n+1)
    X2: np.ndarray  # (n, n+1)
    M0: np.ndarray  # (n+1, n)
    M1: np.ndarray  # (n+1, n+1)


_DISK_CACHE_DIR = os.environ.get(
    "SMCPP_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "smcpp_tpu")
)


@lru_cache(maxsize=None)
def cached_matrices(n: int) -> MatrixCache:
    """The four dense matrices linking tjj integrals to the CSFS.

    Reference: matrix_cache.cpp:212-282.  Computed exactly, float64 at the
    end, persisted to an .npz keyed by n.
    """
    path = os.path.join(_DISK_CACHE_DIR, f"matrices_{n}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return MatrixCache(X0=z["X0"], X2=z["X2"], M0=z["M0"], M1=z["M1"])

    mei = moran_eigensystem(n)
    # exact U needed: recompute the rational U (moran_eigensystem returns
    # float); for matrix products here float64 U is fine because the exact
    # cancellations happen inside the rational Wnbj/coeff computations.
    D_sub_above = np.arange(1, n + 1) / (n + 1.0)  # (n,)
    D_sub_below = 2.0 / np.arange(2, n + 3)  # (n+1,)

    Wnbj = np.zeros((n, n))
    for b in range(1, n + 1):
        for j in range(2, n + 2):
            Wnbj[b - 1, j - 2] = float(_Wnbj(n + 1, b, j))

    P_dist = np.zeros((n + 1, n + 1))
    for k in range(0, n + 1):
        for b in range(1, n - k + 2):
            P_dist[k, b - 1] = float(_pnkb_dist(n, k, b))

    P_undist = np.zeros((n + 1, n))
    for k in range(1, n + 1):
        for b in range(1, n - k + 2):
            P_undist[k, b - 1] = float(_pnkb_undist(n, k, b))

    lsp = np.arange(2, n + 3, dtype=np.float64)  # (n+1,)
    bc = np.array([[float(x) for x in row] for row in _below_coeffs(n)])

    U = mei.U
    X0 = Wnbj.T @ np.diag(1.0 - D_sub_above) @ U[1:, :]  # bottomRows(n)
    # U.reverse() flips both axes; topRows(n) of that = flipped, first n rows
    U_rev = U[::-1, ::-1]
    X2 = Wnbj.T @ np.diag(D_sub_above) @ U_rev[:n, :]
    M0 = bc @ np.diag(lsp * (1.0 - D_sub_below)) @ P_undist
    M1 = bc @ np.diag(lsp * D_sub_below) @ P_dist

    mc = MatrixCache(X0=X0, X2=X2, M0=M0, M1=M1)
    try:
        os.makedirs(_DISK_CACHE_DIR, exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        np.savez(tmp, X0=X0, X2=X2, M0=M0, M1=M1)
        os.replace(tmp, path)
    except OSError:
        pass
    return mc


@lru_cache(maxsize=4)
def cached_matrices_hp(n: int) -> MatrixCache:
    """Long-double MatrixCache: the rational weights AND the assembling
    matrix products are carried in 80-bit precision, which is what extends
    the CSFS accuracy envelope past n ~ 60 (the f64 X0/X2 already carry the
    rounding of a strongly-cancelling Wnbj.T @ diag @ U product)."""
    ld = np.longdouble
    mei = moran_eigensystem_hp(n)
    D_sub_above = np.arange(1, n + 1, dtype=ld) / ld(n + 1)
    D_sub_below = ld(2.0) / np.arange(2, n + 3, dtype=ld)

    Wnbj = np.zeros((n, n), dtype=ld)
    for b in range(1, n + 1):
        for j in range(2, n + 2):
            Wnbj[b - 1, j - 2] = _frac_to_longdouble(_Wnbj(n + 1, b, j))

    P_dist = np.zeros((n + 1, n + 1), dtype=ld)
    for k in range(0, n + 1):
        for b in range(1, n - k + 2):
            P_dist[k, b - 1] = _frac_to_longdouble(_pnkb_dist(n, k, b))

    P_undist = np.zeros((n + 1, n), dtype=ld)
    for k in range(1, n + 1):
        for b in range(1, n - k + 2):
            P_undist[k, b - 1] = _frac_to_longdouble(_pnkb_undist(n, k, b))

    lsp = np.arange(2, n + 3, dtype=ld)
    bc = _frac_array(_below_coeffs(n), ld)

    U = mei.U
    X0 = Wnbj.T @ np.diag(ld(1.0) - D_sub_above) @ U[1:, :]
    U_rev = U[::-1, ::-1]
    X2 = Wnbj.T @ np.diag(D_sub_above) @ U_rev[:n, :]
    M0 = bc @ np.diag(lsp * (ld(1.0) - D_sub_below)) @ P_undist
    M1 = bc @ np.diag(lsp * D_sub_below) @ P_dist
    return MatrixCache(X0=X0, X2=X2, M0=M0, M1=M1)
