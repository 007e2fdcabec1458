"""Two-pop manager on the throughput path: the window/direct kernel must
be selected by the cost model when it wins, and its E-step statistics and
posterior decode must match the span kernel (VERDICT r2 item 2; reference
runs both populations through the same parallel HMM machinery,
src/inference_manager.cpp:525-550)."""

import numpy as np
import pytest

from smcpp_tpu.inference import estimation
from smcpp_tpu.inference.manager import TwoPopInferenceManager
from smcpp_tpu.models import SMCModel, SMCTwoPopulationModel


@pytest.fixture(scope="module")
def twopop_setup():
    rng = np.random.RandomState(11)
    n_rows = 400
    # columns: span, a1, b1, nb1, a2, b2, nb2 with the distinguished pair
    # in pop1 (a1=2, a2=0 — the vcf2smc default for joint data)
    data = np.zeros((n_rows, 7), dtype=np.int32)
    data[:, 0] = rng.randint(20, 400, n_rows)
    data[:, 1] = rng.randint(0, 3, n_rows)
    data[:, 3] = 2
    data[:, 2] = rng.randint(0, 3, n_rows)
    data[:, 4] = -1
    data[:, 6] = 1
    data[:, 5] = rng.randint(0, 2, n_rows)

    m1 = SMCModel([0.01, 3.0], 20000.0, "piecewise", pid="pop1")
    m1.y[:] = 0.0
    m2 = SMCModel([0.01, 3.0], 20000.0, "piecewise", pid="pop2")
    m2.y[:] = 0.1
    jm = SMCTwoPopulationModel(m1, m2, 0.25)
    hs = estimation.balance_hidden_states(m1, 6)
    return data, jm, hs


def _make_im(data, jm, hs, force_span=False, dtype=None):
    import jax.numpy as jnp

    kw = {"estep_dtype": dtype} if dtype is not None else {}
    im = TwoPopInferenceManager(
        2, 1, 2, 0, [data], hs, ("pop1", "pop2"), 0.5, **kw
    )
    if force_span:
        assert im._use_windows  # the cost model picked windows first
        im._use_windows = False
        if im._mesh is not None:
            from smcpp_tpu.parallel import mesh as mesh_mod

            im._spans_sh, im._keys_sh = mesh_mod.shard_batch(
                im._mesh, np.asarray(im._spans), np.asarray(im._keys)
            )
        im._estep_fn = im._build_estep_fn()
    im.set_model(jm)
    im.theta = 1e-4
    im.rho = 1e-4
    im.alpha = 1
    return im


def test_twopop_window_kernel_selected_and_matches_span(twopop_setup):
    import jax.numpy as jnp

    data, jm, hs = twopop_setup
    # f64 E-step: window/direct and span/AD kernels agree to rounding
    im_w = _make_im(data, jm, hs, dtype=jnp.float64)
    assert im_w._use_windows, "cost model should pick the window kernel here"
    im_s = _make_im(data, jm, hs, force_span=True, dtype=jnp.float64)

    ll_w = im_w.E_step()
    ll_s = im_s.E_step()
    assert np.isclose(ll_w, ll_s, rtol=1e-9)
    for a, b in zip(im_w._stats, im_s._stats):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-10)

    # the production f32/bf16-carry path stays within kernel noise of the
    # f64 answer on the aggregate (per-entry stat noise is pinned in
    # tests/test_precision.py)
    im_f = _make_im(data, jm, hs)
    ll_f = im_f.E_step()
    assert np.isclose(ll_f, ll_w, rtol=1e-3)
    for a, b in zip(im_f._stats, im_w._stats):
        assert np.isclose(np.sum(a), np.sum(b), rtol=1e-3)


def test_twopop_posterior_decode_matches_span_oracle(twopop_setup):
    import jax.numpy as jnp

    from smcpp_tpu.ops import hmm

    data, jm, hs = twopop_setup
    im = _make_im(data, jm, hs)
    im.save_gamma = True
    im.E_step()
    g = im.gammas[0]
    assert g.shape[0] == len(data)
    np.testing.assert_allclose(g.sum(axis=1), data[:, 0], rtol=1e-3)

    # span-kernel oracle, per contig, f64
    pi, T, E = (np.asarray(x, np.float64) for x in im.tensors())
    ref = np.asarray(
        hmm.posterior_gammas(
            jnp.asarray(pi), jnp.asarray(T), jnp.asarray(E),
            np.asarray(im._spans[0]), np.asarray(im._keys[0]),
            im._nbits, im._chunk,
        )
    )
    nsub = int(im._row_reps[0].sum())
    offs = np.concatenate([[0], np.cumsum(im._row_reps[0])[:-1]])
    ref_rows = np.add.reduceat(ref[:nsub], offs, axis=0)
    # decode runs the f32 E-step dtype; gammas reach ~2e2 per row
    np.testing.assert_allclose(g, ref_rows, rtol=5e-3, atol=2e-3)


def test_apart_pair_estep_finite(twopop_setup):
    """a1 = a2 = 1 (distinguished lineages split across populations): the
    pre-split size is infinite, which must NOT produce NaN transition rows
    on an M > 1 grid (it did when the stand-in size was 1e300)."""
    _, jm, hs = twopop_setup
    rng = np.random.RandomState(5)
    n_rows = 120
    data = np.zeros((n_rows, 7), dtype=np.int32)
    data[:, 0] = rng.randint(10, 200, n_rows)
    data[:, 1] = rng.randint(0, 2, n_rows)
    data[:, 3] = 1
    data[:, 2] = rng.randint(0, 2, n_rows)
    data[:, 4] = rng.randint(0, 2, n_rows)
    data[:, 6] = 1
    data[:, 5] = rng.randint(0, 2, n_rows)
    im = TwoPopInferenceManager(
        1, 1, 1, 1, [data], hs, ("pop1", "pop2"), 0.5
    )
    im.set_model(jm)
    im.theta = 1e-4
    im.rho = 1e-4
    im.alpha = 1
    im.save_gamma = True
    ll = im.E_step()
    assert np.isfinite(ll)
    g = im.gammas[0]
    np.testing.assert_allclose(g.sum(axis=1), data[:, 0], rtol=1e-3)
    # no posterior mass below the split for the never-coalesced-below pair:
    # hidden intervals entirely below the split time get ~zero gamma
    below = np.asarray(hs[1:]) <= jm.split
    if below.any():
        assert g[:, below].sum() < 1e-3 * g.sum()


def test_tensors_cache_tracks_model_and_rho(twopop_setup):
    """The jitted tensors() pipeline is cached per grid fingerprint with
    rho as a traced argument — changing model values, the split time, or
    rho must flow through to fresh (pi, T, E), matching a from-scratch
    manager with no cache history."""
    data, jm, hs = twopop_setup
    im = _make_im(data, jm, hs)
    base = [np.asarray(x) for x in im.tensors()]

    # rho change: same trace, different traced arg
    im.rho = 5e-4
    fresh = _make_im(data, jm, hs)
    fresh.rho = 5e-4
    for a, b in zip(im.tensors(), fresh.tensors()):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(im.tensors()[1]), base[1])

    # model value + split change: new J / stepwise values through the
    # cached program (s unchanged -> same trace is correct to reuse)
    m1b = SMCModel([0.01, 3.0], 20000.0, "piecewise", pid="pop1")
    m1b.y[:] = 0.3
    m2b = SMCModel([0.01, 3.0], 20000.0, "piecewise", pid="pop2")
    m2b.y[:] = -0.2
    jmb = SMCTwoPopulationModel(m1b, m2b, 0.6)
    im.set_model(jmb)
    im.rho = 1e-4
    fresh2 = _make_im(data, jmb, hs)
    for a, b in zip(im.tensors(), fresh2.tensors()):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(im.tensors()[2]), base[2])
