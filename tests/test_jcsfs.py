"""Joint CSFS correctness via the reference's marginalization oracles
(test/unit/test_jcsfs.py:76-98): summing the JCSFS over one population must
recover the corresponding one-population (C)SFS."""

import numpy as np
import pytest

from smcpp_tpu.ops import jcsfs as jmod

MODEL1 = (np.array([1.0, 4.0]), np.array([0.5, 1.0]))  # (a, s)
MODEL2 = (np.array([2.0, 4.0, 2.0]), np.array([0.1, 0.2, 0.3]))


def concat_models(m1, m2, split):
    "model2 below the split, model1 above (reference test_jcsfs.py:43-57)."
    ary = []
    for a, s in (m1, m2):
        cs = np.concatenate([[0.0], np.cumsum(s)])
        cs[-1] = np.inf
        ip = np.searchsorted(cs, split)
        cs2 = np.insert(cs, ip, split)
        sp = np.diff(cs2)
        ap = np.insert(a, ip, a[ip - 1])
        sp[-1] = 1.0
        ary.append((sp, ap, ip))
    s = np.concatenate([ary[1][0][: ary[1][2]], ary[0][0][ary[0][2] :]])
    a = np.concatenate([ary[1][1][: ary[1][2]], ary[0][1][ary[0][2] :]])
    return a, s


def test_marginal_pop1():
    """Sum over pop-2 axes == one-pop CSFS of model1, per hidden interval.

    The Gauss-Legendre conditional-time transports
    (jcsfs._conditional_coal_quadrature) are deterministic and spectrally
    convergent, so the oracle pins at ~1e-5 even at K=16 — the old MC
    draws needed rtol=1e-1 at K=400 (VERDICT r1 item 10)."""
    ts = np.array([0.0, 1.0, 2.0, np.inf])
    n1, n2 = 5, 8
    j = jmod.JointCSFS(n1, n2, 2, 0, ts, K=16)
    for split in [0.1, 0.5, 1.0, 1.5, 2.5]:
        jc = j.compute(MODEL1, MODEL2, split)
        full = jmod.csfs_raw(*MODEL1, ts, n1)
        for m in range(len(ts) - 1):
            A1 = full[m]
            A2 = jc[m].reshape(3, n1 + 1, 1, n2 + 1).sum(axis=(-1, -2))
            assert np.allclose(
                A1.flat[1:-1], A2.flat[1:-1], rtol=1e-5, atol=1e-8
            ), (split, m)


def test_marginal_pop2():
    "Sum over pop-1 axes == undistinguished SFS of the concatenated model."
    n1, n2 = 8, 10
    j = jmod.JointCSFS(n1, n2, 2, 0, [0.0, np.inf], K=16)
    for split in [0.1, 0.25, 0.5, 1.0, 2.0]:
        a_c, s_c = concat_models(MODEL1, MODEL2, split)
        csfs = jmod.csfs_raw(a_c, s_c, [0.0, np.inf], n2 - 2)[0]
        A1 = jmod.undistinguished_sfs(csfs)[: n2 - 1]
        jc = j.compute(MODEL1, MODEL2, split)[0]
        A2 = jc.reshape(3, n1 + 1, 1, n2 + 1).sum(axis=(0, 1, 2))[1:-1]
        assert np.allclose(A1, A2, rtol=1e-5, atol=1e-8), split


def test_apart_finite_and_structured():
    "a1 = a2 = 1 configuration: finite, nonnegative, zero corners."
    n1, n2 = 4, 5
    hs = [0.0, 0.3, 1.0, np.inf]
    j = jmod.JointCSFS(n1, n2, 1, 1, hs, K=50, seed=4)
    jc = j.compute(MODEL1, MODEL2, 0.4)
    assert np.all(np.isfinite(jc))
    assert np.all(jc >= 0)
    v = jc.reshape(len(hs) - 1, 2, n1 + 1, 2, n2 + 1)
    np.testing.assert_allclose(v[:, 0, 0, 0, 0], 0.0)
    np.testing.assert_allclose(v[:, 1, n1, 1, n2], 0.0)


def test_shift_truncate_params():
    a = np.array([1.0, 2.0, 3.0])
    s = np.array([0.5, 0.5, 1.0])
    ap, sp = jmod.shift_params(a, s, 0.75)
    # shifted model starts inside piece 1
    assert ap[0] == 2.0 and np.isclose(sp[0], 0.25)
    at, st = jmod.truncate_params(a, s, 0.75)
    assert at[-1] == 1e-8  # crash piece
    assert np.isclose(np.sum(st[:-1]), 0.75)
