"""Benchmark: E-step forward-backward throughput (Gbp/sec/chip).

Human-scale configuration from BASELINE.md C3: n = 50 haplotypes, 22
autosome-sized contigs (250 Mbp each, w = 100 bp windows -> 2.5e6 windows
per contig), M = 16 hidden states — the reference's default `estimate`
workload shape.

The synthetic observation stream matches the row statistics of real
post-pipeline data (mostly short nonpolymorphic runs + dinucleotide windows,
sparse full-SFS rows); the E-step cost depends only on those shapes.

vs_baseline: the reference publishes no numbers (BASELINE.md) and cannot be
built in this image (no GMP/MPFR/GSL headers, no Cython).  The denominator
0.5 Gbp/s is an estimate for 16-core CPU SMC++ E-step throughput derived
from its per-row cost (O(M^2) eigenbasis ops per compressed row ~ 1 us/row,
~5e5 rows + forward+backward passes per 0.25 Gbp contig, 16 threads) and
should be replaced by a measured number when a buildable reference exists.
"""

import json
import time

import numpy as np

REFERENCE_ESTEP_GBP_PER_SEC = 0.5  # estimated; see module docstring


def synth_contig(rng, n_windows, n_keys, full_key_lo):
    "Span-compressed rows mimicking thinned+binned human data."
    rows = []
    total = 0
    while total < n_windows:
        r = rng.random()
        if r < 0.80:
            span = int(rng.geometric(0.45))  # short run
            key = int(rng.integers(0, 3))  # dinuc/missing keys
        elif r < 0.97:
            span = int(rng.geometric(0.02))  # long homozygous run
            key = 0
        else:
            span = 1
            key = int(rng.integers(full_key_lo, n_keys))  # full-SFS row
        span = min(span, n_windows - total)
        rows.append((span, key))
        total += span
    return np.array(rows, dtype=np.int64)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import smcpp_tpu  # noqa: F401
    from smcpp_tpu.inference.manager import _best_max_span, _split_spans
    from smcpp_tpu.ops import hmm

    from functools import partial

    rng = np.random.default_rng(0)
    C = 22
    WINDOWS = 2_500_000  # 250 Mbp at w = 100
    W = 100
    M = 16
    n_keys = 128
    chunk = 256

    raw = [synth_contig(rng, WINDOWS, n_keys, 3) for _ in range(C)]
    S = _best_max_span([r[:, 0] for r in raw])
    spans_l, keys_l = [], []
    for r in raw:
        s2, k2 = _split_spans(r[:, 0], r[:, 1].astype(np.int32), S)
        spans_l.append(s2)
        keys_l.append(k2)
    Lmax = -(-max(len(s) for s in spans_l) // chunk) * chunk
    spans = np.zeros((C, Lmax), dtype=np.int32)
    keys = np.zeros((C, Lmax), dtype=np.int32)
    for i, (s, k) in enumerate(zip(spans_l, keys_l)):
        spans[i, : len(s)] = s
        keys[i, : len(k)] = k
    nbits = int(spans.max()).bit_length()

    pi = rng.dirichlet(np.ones(M))
    T = rng.dirichlet(np.ones(M) * 40, size=M)
    T = T + np.eye(M) * 50
    T /= T.sum(1, keepdims=True)
    E = rng.uniform(0.05, 1.0, (n_keys, M))

    dev = jax.devices()[0]
    dt = jnp.float32
    args = [
        jax.device_put(jnp.asarray(x, dt), dev) for x in (pi, T, E)
    ] + [jax.device_put(jnp.asarray(x), dev) for x in (spans, keys)]

    estep = jax.jit(partial(hmm.estep, nbits=nbits, chunk=chunk), device=dev)
    # warmup / compile
    out = estep(*args)
    jax.block_until_ready(out)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = estep(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt_s = float(np.median(times))
    total_bases = float(sum(r[:, 0].sum() for r in raw)) * W
    gbps = total_bases / dt_s / 1e9
    print(
        json.dumps(
            {
                "metric": "estep_throughput",
                "value": round(gbps, 3),
                "unit": "Gbp/s",
                "vs_baseline": round(gbps / REFERENCE_ESTEP_GBP_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
