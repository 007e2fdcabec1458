"""Multi-device data parallelism: the sharded E-step must agree exactly with
the single-device E-step (the psum of statistics is inserted by XLA when
differentiating the sharded sum w.r.t. replicated tensors)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcpp_tpu.ops import hmm
from smcpp_tpu.parallel import mesh as mesh_mod


def test_sharded_estep_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    rng = np.random.RandomState(0)
    M, nk, C, L = 8, 12, 8, 64
    pi = jnp.asarray(rng.dirichlet(np.ones(M)))
    T = jnp.asarray(rng.dirichlet(np.ones(M), size=M))
    E = jnp.asarray(rng.uniform(0.1, 1.0, (nk, M)))
    spans = rng.geometric(0.3, size=(C, L)).astype(np.int32)
    keys = rng.randint(0, nk, size=(C, L)).astype(np.int32)
    nbits = int(spans.max()).bit_length()

    ll1, g1, x1, gs1 = jax.jit(partial(hmm.estep, nbits=nbits, chunk=16))(
        pi, T, E, jnp.asarray(spans), jnp.asarray(keys)
    )

    mesh = mesh_mod.make_mesh(jax.devices()[:8])
    sp_d, ky_d = mesh_mod.shard_batch(mesh, spans, keys)
    estep = mesh_mod.make_sharded_estep(mesh, nbits=nbits, chunk=16)
    ll2, g2, x2, gs2 = estep(pi, T, E, sp_d, ky_d)

    assert np.isclose(float(ll1), float(ll2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2), rtol=1e-10)


def test_sharded_padding_contigs():
    "Contig-axis padding (C not a multiple of mesh size) changes nothing."
    rng = np.random.RandomState(1)
    M, nk, C, L = 4, 6, 5, 32
    pi = jnp.asarray(rng.dirichlet(np.ones(M)))
    T = jnp.asarray(rng.dirichlet(np.ones(M), size=M))
    E = jnp.asarray(rng.uniform(0.1, 1.0, (nk, M)))
    spans = rng.geometric(0.3, size=(C, L)).astype(np.int32)
    keys = rng.randint(0, nk, size=(C, L)).astype(np.int32)
    nbits = int(spans.max()).bit_length()

    ll1, *_ = jax.jit(partial(hmm.estep, nbits=nbits, chunk=16))(
        pi, T, E, jnp.asarray(spans), jnp.asarray(keys)
    )
    mesh = mesh_mod.make_mesh(jax.devices()[:8])
    sp_d, ky_d = mesh_mod.shard_batch(mesh, spans, keys)
    assert sp_d.shape[0] == 8
    estep = mesh_mod.make_sharded_estep(mesh, nbits=nbits, chunk=16)
    ll2, *_ = estep(pi, T, E, sp_d, ky_d)
    assert np.isclose(float(ll1), float(ll2), rtol=1e-12)


def _synth_contigs(rng, n, n_contigs, span_lo, span_hi):
    data = []
    for _ in range(n_contigs):
        rows = rng.randint(30, 70)
        sp = rng.randint(span_lo, span_hi, rows)
        a = rng.randint(0, 3, rows)
        b = rng.randint(0, n + 1, rows)
        data.append(np.c_[sp, a, b, np.full(rows, n)].astype(np.int64))
    return data


def _make_im(data, n, devices=None):
    from smcpp_tpu.inference.manager import OnePopInferenceManager
    from smcpp_tpu.models import SMCModel

    hs = np.r_[0.0, np.logspace(-1.2, 0.6, 7), np.inf]
    im = OnePopInferenceManager(n, data, hs, ("p",), 0.5, devices=devices)
    m = SMCModel(np.array([0.05, 0.3, 1.5]), 1e4, "piecewise")
    m.y[:] = 0.2
    im.set_model(m)
    im.theta = 1e-4
    im.rho = 1e-4
    return im


@pytest.mark.parametrize("span_range", [(1, 12), (2000, 9000)],
                         ids=["window-kernel", "span-kernel"])
def test_manager_mesh_matches_single_device(span_range):
    """THE production path (VERDICT round 1 item 1): OnePopInferenceManager
    on the full 8-device mesh must reproduce the single-device E-step and
    M-step objective, for both kernel choices."""
    rng = np.random.RandomState(7)
    n = 4
    data = _synth_contigs(rng, n, 3, *span_range)
    im1 = _make_im(data, n, devices=[jax.devices()[0]])
    im8 = _make_im(data, n)  # conftest provides 8 CPU devices
    assert im1._mesh is None
    assert im8._mesh is not None and im8._mesh.devices.size == 8
    # same kernel family must have been chosen
    assert im1._use_windows == im8._use_windows
    expected_windows = span_range[0] == 1
    assert im1._use_windows == expected_windows

    ll1 = im1.E_step()
    ll8 = im8.E_step()
    assert np.isclose(ll1, ll8, rtol=1e-6)
    for s1, s8 in zip(im1._stats, im8._stats):
        # f32 kernel: sharded reduction order shifts last-ulp digits
        np.testing.assert_allclose(s8, s1, rtol=1e-4, atol=1e-5)
    q1, g1 = im1.Q_and_grad()
    im8._stats = im1._stats  # isolate the Q path from f32 stat noise
    q8, g8 = im8.Q_and_grad()
    assert np.isclose(q1, q8, rtol=1e-12)
    np.testing.assert_allclose(g8, g1, rtol=1e-10)


def test_sharded_window_estep():
    "Window-kernel data parallelism via shard_map matches single device."
    from smcpp_tpu.ops import window_kernel as wk

    rng = np.random.RandomState(2)
    nk = 9
    data = []
    for _ in range(5):  # 5 contigs -> padded to 8
        rows = rng.randint(20, 60)
        d = np.c_[rng.randint(1, 20, rows), rng.randint(0, nk, rows)].astype(
            np.int64
        )
        data.append(d)
    key_id = {(k,): k for k in range(nk)}
    M = 4
    pi = jnp.asarray(rng.dirichlet(np.ones(M)))
    T = jnp.asarray(rng.dirichlet(np.ones(M), size=M))
    E = jnp.asarray(rng.uniform(0.1, 1.0, (nk, M)))

    mesh = mesh_mod.make_mesh(jax.devices()[:8])
    kk, vv, soc = wk.pack_windows(data, key_id, seg_target=32)
    keys, valid = mesh_mod.pad_segments(kk, vv, mesh.devices.size)
    estep = mesh_mod.make_sharded_window_estep(mesh, soc)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data", None))
    out = estep(
        pi, T, E,
        jax.device_put(jnp.asarray(keys), sh),
        jax.device_put(jnp.asarray(valid), sh),
    )

    # single-device oracle via the plain window kernel
    ll1, g1, x1, gs1 = wk.estep_windows(
        pi, T, E, jnp.asarray(kk), jnp.asarray(vv), soc
    )
    assert np.isclose(float(out[0]), float(ll1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(g1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(x1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(gs1), rtol=1e-8)


def test_sharded_direct_estep():
    """Direct (AD-free) Baum-Welch sharded E-step matches the single-device
    AD kernel, including with all-invalid padding segments."""
    from smcpp_tpu.ops import window_kernel as wk

    rng = np.random.RandomState(3)
    nk = 9
    data = []
    for _ in range(5):
        rows = rng.randint(20, 60)
        d = np.c_[rng.randint(1, 20, rows), rng.randint(0, nk, rows)].astype(
            np.int64
        )
        data.append(d)
    key_id = {(k,): k for k in range(nk)}
    M = 4
    pi = jnp.asarray(rng.dirichlet(np.ones(M)))
    T = jnp.asarray(rng.dirichlet(np.ones(M), size=M))
    E = jnp.asarray(rng.uniform(0.1, 1.0, (nk, M)))

    mesh = mesh_mod.make_mesh(jax.devices()[:8])
    kk, vv, soc = wk.pack_windows(data, key_id, seg_target=32)
    keys, valid = mesh_mod.pad_segments(kk, vv, mesh.devices.size)
    estep = mesh_mod.make_sharded_direct_estep(mesh, soc)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data", None))
    out = estep(
        pi, T, E,
        jax.device_put(jnp.asarray(keys), sh),
        jax.device_put(jnp.asarray(valid), sh),
    )
    ll1, g1, x1, gs1 = wk.estep_windows(
        pi, T, E, jnp.asarray(kk), jnp.asarray(vv), soc
    )
    assert np.isclose(float(out[0]), float(ll1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(g1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(x1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(gs1), rtol=1e-8)


def test_sharded_direct_estep_no_stream():
    "Sharded direct E-step with the emission-stream fallback disabled."
    from smcpp_tpu.ops import window_kernel as wk

    rng = np.random.RandomState(5)
    nk, M = 6, 4
    data = [
        np.c_[rng.randint(1, 10, 30), rng.randint(0, nk, 30)].astype(np.int64)
        for _ in range(3)
    ]
    key_id = {(k,): k for k in range(nk)}
    pi = jnp.asarray(rng.dirichlet(np.ones(M)))
    T = jnp.asarray(rng.dirichlet(np.ones(M), size=M))
    E = jnp.asarray(rng.uniform(0.1, 1.0, (nk, M)))
    mesh = mesh_mod.make_mesh(jax.devices()[:8])
    kk, vv, soc = wk.pack_windows(data, key_id, seg_target=16)
    keys, valid = mesh_mod.pad_segments(kk, vv, mesh.devices.size)
    estep = mesh_mod.make_sharded_direct_estep(mesh, soc, e_stream=False)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data", None))
    out = estep(
        pi, T, E,
        jax.device_put(jnp.asarray(keys), sh),
        jax.device_put(jnp.asarray(valid), sh),
    )
    ref = wk.estep_direct(pi, T, E, jnp.asarray(kk), jnp.asarray(vv), soc)
    assert np.isclose(float(out[0]), float(ref[0]), rtol=1e-10)
    for a, b in zip(out[1:], ref[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)
