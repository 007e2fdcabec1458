"""Two-pop posterior decode at production scale (VERDICT r3 item 7).

Pins benchmarks/twopop_decode.py: M = 32, ~1e7 windows through
`TwoPopInferenceManager` with the windowed decode verified against the
span-kernel f64 oracle on a probe contig.  The full run needs a TPU chip
(or CPU patience), so it is opt-in like the 1 Gbp fit; the recorded
artifact is checked unconditionally.  Reference analogue: two-pop runs
through the same full-size HMM machinery
(/root/reference/src/inference_manager.cpp:525-550).
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)),
    "benchmarks", "twopop_decode.py",
)
RESULT = os.path.join(
    os.path.dirname(os.path.dirname(__file__)),
    "benchmarks", "results", "twopop_decode_r5.json",
)
ORACLE_BOUND = 5e-2  # f32 decode vs f64 span oracle, relative
# round-5 regression bar: the traced JCSFS pipeline made the two-pop
# E-step kernel-bound (0.106 s measured); 0.2 allows tunnel volatility
ESTEP_BOUND_S = 0.2


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SMCPP_TPU_RUN_LARGE") != "1",
    reason="1e7-window two-pop decode: opt-in via SMCPP_TPU_RUN_LARGE=1",
)
def test_twopop_decode_at_scale():
    out = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True, text=True, timeout=3600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["M"] == 32 and res["windows"] >= 10_000_000
    assert res["probe_oracle_max_rel_err"] <= ORACLE_BOUND, res


@pytest.mark.skipif(
    not os.path.exists(RESULT),
    reason="recorded artifact not produced yet (needs a TPU run)",
)
def test_recorded_twopop_result():
    "The committed benchmark artifact satisfies the pinned bounds."
    res = json.load(open(RESULT))["result"]
    assert res["M"] == 32 and res["windows"] >= 10_000_000
    assert res["probe_oracle_max_rel_err"] <= ORACLE_BOUND
    assert res["estep_s"] <= ESTEP_BOUND_S
    # round-5 decomposition: the f32-vs-f64-span error must be pure
    # precision — the window and span algorithms agree at f64
    assert res["n_probes"] >= 3
    assert res["probe_err_algorithmic"] <= 2e-3
