"""Multi-host (multi-process) execution of the sharded E-step.

The reference has nothing distributed to test (SURVEY.md §2.3/§4); this
exercises the jax.distributed path end-to-end on CPU: two OS processes,
each owning 2 forced-host devices, form a 4-device global mesh; each
process places only ITS half of the segment rows
(jax.make_array_from_process_local_data), and the segment-sharded window
E-step must reproduce the single-process oracle exactly.
"""

import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(__file__)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_window_estep(tmp_path):
    port = _free_port()
    out = str(tmp_path / "proc0.npz")
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # never claim the TPU tunnel from workers
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.path.dirname(HERE),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_distributed_worker.py"),
             str(i), "2", str(port), out],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    z = np.load(out)
    assert int(z["n_global_devices"]) == 4

    # single-process oracle on the same deterministic problem
    sys.path.insert(0, HERE)
    try:
        from _distributed_worker import synth_problem
    finally:
        sys.path.pop(0)
    from smcpp_tpu.ops import window_kernel as wk

    pi, T, E, kk, vv, soc = synth_problem()
    ll1, g1, x1, gs1 = wk.estep_windows(
        jnp.asarray(pi), jnp.asarray(T), jnp.asarray(E),
        jnp.asarray(kk), jnp.asarray(vv), soc,
    )
    assert np.isclose(float(z["ll"]), float(ll1), rtol=1e-10)
    np.testing.assert_allclose(z["gamma0"], np.asarray(g1), rtol=1e-8)
    np.testing.assert_allclose(z["xisum"], np.asarray(x1), rtol=1e-8)
    np.testing.assert_allclose(z["gamma_sums"], np.asarray(gs1), rtol=1e-8)
