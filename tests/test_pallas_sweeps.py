"""Pallas stat-sweep kernels vs the XLA sweeps (interpret mode on CPU).

ops/pallas_sweeps.py reimplements stats_pass's ascending/descending
lockstep sweeps as Pallas TPU programs (VMEM-resident carries).  At
'highest' matmul precision the recursions are identical f32 arithmetic, so
alpha_end/u_start must match the XLA sweeps EXACTLY; xo/gsum differ only
by the f32-per-tile accumulation (vs f64 per step), bounded here at 1e-5
relative.  The compiled-mode selection (SMCPP_TPU_SWEEP=pallas) is
qualified on hardware by benchmarks; these tests pin the semantics.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from smcpp_tpu.ops import pallas_sweeps as ps
from smcpp_tpu.ops import window_kernel as wk


def _problem(seed, S, L, M=16, n_keys=89, invalid_tail=2):
    rng = np.random.RandomState(seed)
    T = rng.dirichlet(np.ones(M), size=M).astype(np.float32)
    E = rng.uniform(0.05, 1.0, (n_keys, M)).astype(np.float32)
    keys = rng.randint(0, n_keys, (S, L)).astype(np.int32)
    valid = rng.rand(S, L) < 0.9
    if invalid_tail:
        valid[-invalid_tail:] = False  # mesh-padding segments
    A_in = rng.rand(S, M).astype(np.float32)
    Q_end = rng.rand(S, M).astype(np.float32)
    return T, E, keys, valid, A_in, Q_end


@pytest.mark.parametrize("S,L", [(8, 256), (24, 192)])
def test_pallas_sweeps_match_xla_exact(S, L):
    "f32-'highest': bit-identical alphas, f32-accumulation-level stats."
    T, E, keys, valid, A_in, Q_end = _problem(0, S, L)
    ref = wk.stats_pass(
        jnp.asarray(T), jnp.asarray(E), jnp.asarray(keys),
        jnp.asarray(valid), jnp.asarray(A_in), jnp.asarray(Q_end),
        None, precision="highest",
    )
    got = ps.sweeps(
        jnp.asarray(T), jnp.asarray(E), jnp.asarray(keys.T),
        jnp.asarray(valid.T), jnp.asarray(A_in), jnp.asarray(Q_end),
        alpha_dtype=jnp.float32, precision="highest", interpret=True,
    )
    a_r, u_r, xo_r, gs_r = [np.asarray(x, np.float64) for x in ref]
    a_g, u_g, xo_g, gs_g = [np.asarray(x, np.float64) for x in got]
    np.testing.assert_array_equal(a_g, a_r)
    # u_start goes through one extra matmul chain; identical recursion but
    # ulp-level f32 rounding may differ between the lowering paths
    np.testing.assert_allclose(u_g, u_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(xo_g, xo_r, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(gs_g, gs_r, rtol=1e-5, atol=1e-8)


def test_pallas_sweeps_multi_segment_tile(monkeypatch):
    """n_s > 1 (the segment axis split across grid tiles) exercises the
    per-(l, s) snapshot outputs and the caller's cross-tile reductions;
    M=32 exercises the wider-state tiling (l_blk shrinks to keep the
    alpha slab in budget)."""
    monkeypatch.setattr(ps, "_S_TILE_MAX", 512)
    T, E, keys, valid, A_in, Q_end = _problem(3, 600, 64, M=32)
    assert ps._shapes(600, 64, 32, 89)[0] // ps._shapes(600, 64, 32, 89)[2] == 2
    ref = wk.stats_pass(
        jnp.asarray(T), jnp.asarray(E), jnp.asarray(keys),
        jnp.asarray(valid), jnp.asarray(A_in), jnp.asarray(Q_end),
        None, precision="highest",
    )
    got = ps.sweeps(
        jnp.asarray(T), jnp.asarray(E), jnp.asarray(keys.T),
        jnp.asarray(valid.T), jnp.asarray(A_in), jnp.asarray(Q_end),
        alpha_dtype=jnp.float32, precision="highest", interpret=True,
    )
    a_r, u_r, xo_r, gs_r = [np.asarray(x, np.float64) for x in ref]
    a_g, u_g, xo_g, gs_g = [np.asarray(x, np.float64) for x in got]
    np.testing.assert_array_equal(a_g, a_r)
    np.testing.assert_allclose(u_g, u_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(xo_g, xo_r, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(gs_g, gs_r, rtol=1e-5, atol=1e-8)


def test_pallas_sweeps_default_precision_envelope():
    """'default' (bf16 matmul operands, bf16 alpha storage — the
    production rung): stats agree with the exact-f32 XLA sweeps to
    bf16-noise tolerances, and per-key masses stay conservative (the
    summed gsum equals the valid-window count to f32 accumulation)."""
    T, E, keys, valid, A_in, Q_end = _problem(1, 16, 256)
    ref = wk.stats_pass(
        jnp.asarray(T), jnp.asarray(E), jnp.asarray(keys),
        jnp.asarray(valid), jnp.asarray(A_in), jnp.asarray(Q_end),
        None, precision="highest",
    )
    got = ps.sweeps(
        jnp.asarray(T), jnp.asarray(E), jnp.asarray(keys.T),
        jnp.asarray(valid.T), jnp.asarray(A_in), jnp.asarray(Q_end),
        alpha_dtype=jnp.bfloat16, precision="default", interpret=True,
    )
    _, _, xo_r, gs_r = [np.asarray(x, np.float64) for x in ref]
    _, _, xo_g, gs_g = [np.asarray(x, np.float64) for x in got]
    assert np.abs(xo_g - xo_r).max() / np.abs(xo_r).max() < 5e-2
    assert np.abs(gs_g - gs_r).max() / np.abs(gs_r).max() < 5e-2
    # conservation: every valid window contributes exactly one unit of
    # posterior mass across (key, state)
    np.testing.assert_allclose(gs_g.sum(), valid.sum(), rtol=1e-5)


def test_stats_pass_pallas_gate(monkeypatch):
    """stats_pass routes to the Pallas sweeps only for the supported
    configuration and matches the XLA result through the public entry
    (interpret mode so the gate is testable on CPU)."""
    calls = {}
    real = ps.sweeps

    def spy(*a, **kw):
        calls["hit"] = True
        kw["interpret"] = True
        return real(*a, **kw)

    monkeypatch.setattr(ps, "sweeps", spy)
    monkeypatch.setattr(wk, "SWEEP_IMPL", "pallas")
    monkeypatch.setattr(wk, "_pallas_ok", lambda _T: True)
    T, E, keys, valid, A_in, Q_end = _problem(2, 8, 128)
    args = (jnp.asarray(T), jnp.asarray(E), jnp.asarray(keys),
            jnp.asarray(valid), jnp.asarray(A_in), jnp.asarray(Q_end))
    out = wk.stats_pass(*args, None, precision="highest")
    assert calls.get("hit")
    monkeypatch.setattr(wk, "SWEEP_IMPL", "xla")
    ref = wk.stats_pass(*args, None, precision="highest")
    for g, r in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(r, np.float64),
            rtol=1e-5, atol=1e-8,
        )
    # unsupported config (emit_gamma) must fall back to XLA even when
    # pallas is selected
    calls.clear()
    monkeypatch.setattr(wk, "SWEEP_IMPL", "pallas")
    out2 = wk.stats_pass(*args, None, precision="highest", emit_gamma=True)
    assert "hit" not in calls
    assert len(out2) == 5
