"""Differentiable splines over log-population-size knot values.

Pure functions of the traced knot-value vector ``y``; the knot locations and
query points are static, so everything reduces to fixed linear algebra and
elementwise selects — jit- and grad-friendly.  The reference implements these
with object-dtype NumPy over its vendored ``ad`` scalars
(/root/reference/smcpp/spline/); here ``jax.grad`` does the work.
"""

import jax.numpy as jnp
import numpy as np


class Spline:
    "Order-p polynomial spline with flat extrapolation (spline/spline.py)."

    P = 0

    def __init__(self, x):
        self.x = np.asarray(x, dtype=np.float64)

    def coefficients(self, y):
        "Return (P+1, K) coefficient rows, highest order first."
        raise NotImplementedError

    def __call__(self, y, points):
        "Evaluate at static query points.  y traced, points static."
        points = np.atleast_1d(np.asarray(points, dtype=np.float64))
        x = self.x
        coef = self.coefficients(y)
        ip = np.searchsorted(x, points, side="right") - 1  # static
        below = ip < 0
        above = ip >= len(x) - 1
        good = ~below & ~above
        ipg = np.clip(ip, 0, len(x) - 2)
        powers = np.arange(self.P, -1, -1)[:, None]  # static
        xi = (points - x[ipg]) ** powers  # static (P+1, Q)
        xi = np.where(good[None, :], xi, 0.0)
        vals = jnp.sum(coef[:, ipg] * xi, axis=0)
        vals = jnp.where(below, coef[-1, 0], vals)
        vals = jnp.where(above, coef[-1, -1], vals)
        return vals

    def roughness(self, y):
        "Sum of squared second differences of the knot values."
        return jnp.sum(jnp.diff(y, 2) ** 2)


class Piecewise(Spline):
    P = 0

    def coefficients(self, y):
        return jnp.asarray(y)[None, :]


class CubicSpline(Spline):
    """Natural cubic spline (spline/cubic.py:28-67).

    The tridiagonal system has *static* band coefficients (they depend only
    on knot spacings), so the solve is precomputed as a dense matrix applied
    to the traced right-hand side.
    """

    P = 3

    def __init__(self, x):
        super().__init__(x)
        h = np.diff(self.x)
        K = len(self.x)
        a = np.append(h[:-1] / 3.0, h[-1])  # subdiagonal (K-1)
        b = 2.0 * np.concatenate([[h[0]], (h[1:] + h[:-1]) / 3.0, [h[-1]]])
        c = np.concatenate([[h[0]], h[1:] / 3.0])  # superdiagonal (K-1)
        T = np.zeros((K, K))
        T[np.arange(K), np.arange(K)] = b
        T[np.arange(1, K), np.arange(K - 1)] = a
        T[np.arange(K - 1), np.arange(1, K)] = c
        self._solve = np.linalg.inv(T)  # K is small (~8-16 knots)
        self._h = h

    def _rhs(self, y):
        h = self._h
        jh = jnp.diff(y) / h
        return jnp.concatenate(
            [3.0 * jh[:1], jh[1:] - jh[:-1], -3.0 * jh[-1:]]
        )

    def coefficients(self, y):
        y = jnp.asarray(y)
        h = self._h
        jh = jnp.diff(y) / h
        cb = self._solve @ self._rhs(y)
        ca = jnp.append((cb[1:] - cb[:-1]) / h / 3.0, 0.0)
        cc = jh - h * (2.0 * cb[:-1] + cb[1:]) / 3.0
        cc = jnp.append(
            cc, 3.0 * ca[-2] * h[-1] ** 2 + 2.0 * cb[-2] * h[-1] + cc[-1]
        )
        return jnp.stack([ca, cb, cc, y])

    def roughness(self, y):
        "Exact integral of the squared second derivative (cubic.py:63-67)."
        coef = self.coefficients(y)
        a, b = coef[0, :-1], coef[1, :-1]
        xi = np.diff(self.x)
        return jnp.sum(
            12.0 * a**2 * xi**3 + 12.0 * a * b * xi**2 + 4.0 * b**2 * xi
        )


def _smooth_abs(x):
    return jnp.sqrt(x**2 + 1e-3)


class PChipSpline(CubicSpline):
    "C1 monotone cubic (spline/pchip.py), elementwise-select formulation."

    def coefficients(self, y):
        y = jnp.asarray(y)
        x = self.x
        h = np.diff(x)
        n = len(x)
        delta = jnp.diff(y) / h
        # interior slopes: weighted harmonic mean where deltas share a sign
        w1 = 2 * h[1:] + h[:-1]
        w2 = h[1:] + 2 * h[:-1]
        same = jnp.sign(delta[:-1]) * jnp.sign(delta[1:]) > 0
        delta_safe0 = jnp.where(delta[:-1] == 0, 1.0, delta[:-1])
        delta_safe1 = jnp.where(delta[1:] == 0, 1.0, delta[1:])
        hm = (w1 + w2) / (w1 / delta_safe0 + w2 / delta_safe1)
        d_int = jnp.where(same, hm, 0.0)

        def endpoint(h1, h2, del1, del2):
            d = ((2 * h1 + h2) * del1 - h1 * del2) / (h1 + h2)
            d = jnp.where(jnp.sign(d) != jnp.sign(del1), 0.0, d)
            d = jnp.where(
                (jnp.sign(del1) != jnp.sign(del2))
                & (_smooth_abs(d) > _smooth_abs(3 * del1)),
                3 * del1,
                d,
            )
            return d

        d0 = endpoint(h[0], h[1], delta[0], delta[1])
        dn = endpoint(h[n - 2], h[n - 3], delta[n - 2], delta[n - 3])
        d = jnp.concatenate([d0[None], d_int, dn[None]])
        c = (3 * delta - 2 * d[: n - 1] - d[1:n]) / h
        b = (d[: n - 1] - 2 * delta + d[1:n]) / h**2
        b = jnp.append(b, 0.0)
        c = jnp.append(c, 0.0)
        return jnp.stack([b, c, d, y])


class AkimaSpline(CubicSpline):
    "Akima's interpolant (spline/akima.py), elementwise formulation."

    def coefficients(self, y):
        y = jnp.asarray(y)
        x = self.x
        dx = np.diff(x)
        n = len(x)
        m = jnp.diff(y) / dx
        mm = 2.0 * m[0] - m[1]
        mmm = 2.0 * mm - m[0]
        mp = 2.0 * m[n - 2] - m[n - 3]
        mpp = 2.0 * mp - m[n - 2]
        m1 = jnp.concatenate([mmm[None], mm[None], m, mp[None], mpp[None]])
        dm = _smooth_abs(jnp.diff(m1))
        f1 = dm[2 : n + 2]
        f2 = dm[0:n]
        f12 = f1 + f2
        use = f12 > 1e-9 * jnp.max(f12)
        f12_safe = jnp.where(use, f12, 1.0)
        b = jnp.where(
            use,
            (f1 * m1[1 : n + 1] + f2 * m1[2 : n + 2]) / f12_safe,
            m1[1 : n + 1],
        )
        c = (3.0 * m - 2.0 * b[: n - 1] - b[1:n]) / dx
        d = (b[: n - 1] + b[1:n] - 2.0 * m) / dx**2
        c = jnp.append(c, 0.0)
        d = jnp.append(d, 0.0)
        return jnp.stack([d, c, b, y])


class BSpline(Spline):
    """Cubic B-spline over a clamped knot vector.

    The reference's symbolic PPoly construction (spline/bspline.py) uses
    K + 2 control points for K knots; evaluation is linear in the control
    points, so here it reduces to a static design matrix (scipy) applied to
    the traced coefficient vector.  Flat extrapolation outside the knots,
    second-difference roughness (bspline.py:123-124).
    """

    P = 3

    def __init__(self, x):
        super().__init__(x)
        import scipy.interpolate

        K = len(self.x)
        self._t = np.concatenate(
            [[self.x[0]] * 3, self.x, [self.x[-1]] * 3]
        )
        self.n_coef = K + 2

        def design(points):
            pts = np.clip(points, self.x[0], self.x[-1])
            return np.asarray(
                scipy.interpolate.BSpline.design_matrix(
                    pts, self._t, 3, extrapolate=False
                ).todense()
            )

        self._design = design
        # least-squares fit of control points to values at the knots
        Dk = design(self.x)
        self._fit_pinv = np.linalg.pinv(Dk)

    def __call__(self, y, points):
        points = np.atleast_1d(np.asarray(points, dtype=np.float64))
        D = self._design(points)  # static (Q, K+2)
        return D @ jnp.asarray(y)

    def fit_to(self, knot_values):
        "Control points whose spline least-squares matches values at knots."
        return self._fit_pinv @ np.asarray(knot_values, dtype=np.float64)

    def roughness(self, y):
        return jnp.sum(jnp.diff(y, 2) ** 2)


SPLINE_CLASSES = {
    "piecewise": Piecewise,
    "cubic": CubicSpline,
    "pchip": PChipSpline,
    "akima": AkimaSpline,
    "bspline": BSpline,
    # names as serialized by the reference (model JSON compatibility)
    "Piecewise": Piecewise,
    "CubicSpline": CubicSpline,
    "PChipSpline": PChipSpline,
    "AkimaSpline": AkimaSpline,
    "BSpline": BSpline,
}
