"""Generative simulation from the model's own coalescent HMM.

Samples a hidden TMRCA path along the genome from (pi, T) and per-site
observations from the theta-incorporated CSFS — the exact generative process
the inference engine fits.  Used for parameter-recovery validation and as an
msprime-free fallback for the `simulate` command (the reference's simulate
requires msprime, /root/reference/smcpp/commands/simulate.py).
"""

import numpy as np

from ..inference import estimation
from ..ops import csfs as csfs_mod
from ..ops import grid as grid_mod
from ..ops import ratefunc, transition


def simulate_contig(model, theta, rho, L, n, seed=0, M=32):
    """Simulate one contig of length L bases with n undistinguished lineages.

    Returns an (rows, 4) int32 observation array in the SMC++ row format
    (span, a, b, nb) with nb == n everywhere.
    """
    rng = np.random.RandomState(seed)
    hs = estimation.balance_hidden_states(model, M)
    g = grid_mod.make_time_grid(model.s, hs)
    a_vals = np.asarray(model.stepwise_values(), dtype=np.float64)
    pi = np.asarray(ratefunc.initial_distribution(a_vals, g))
    T = np.asarray(transition.transition_matrix(a_vals, rho, g))
    em = np.asarray(
        csfs_mod.incorporate_theta(
            csfs_mod.conditioned_sfs(a_vals, g, n), theta
        )
    )  # (M, 3, n+1)

    # --- sample the hidden path as (state, run-length) pairs
    Tn = T / T.sum(axis=1, keepdims=True)
    self_p = np.diag(Tn)
    jump = Tn.copy()
    np.fill_diagonal(jump, 0.0)
    jump /= jump.sum(axis=1, keepdims=True)
    states, lengths = [], []
    s = rng.choice(len(pi), p=pi / pi.sum())
    pos = 0
    while pos < L:
        run = rng.geometric(max(1.0 - self_p[s], 1e-12))
        run = min(run, L - pos)
        states.append(s)
        lengths.append(run)
        pos += run
        if pos < L:
            s = rng.choice(len(pi), p=jump[s])

    # --- per-run emissions: segregating sites are sparse
    rows = []
    nk = em.shape[1] * em.shape[2]
    for s, run in zip(states, lengths):
        probs = em[s].ravel().astype(np.float64)
        probs = np.maximum(probs, 0)
        p_seg = 1.0 - probs[0] / probs.sum()
        k = rng.binomial(run, p_seg)
        if k == 0:
            rows.append((run, 0, 0, n))
            continue
        positions = np.sort(rng.choice(run, size=k, replace=False))
        seg_probs = probs.copy()
        seg_probs[0] = 0.0
        seg_probs /= seg_probs.sum()
        cats = rng.choice(nk, size=k, p=seg_probs)
        last = 0
        for p_, c in zip(positions, cats):
            gap = p_ - last
            if gap > 0:
                rows.append((gap, 0, 0, n))
            aa, bb = divmod(int(c), em.shape[2])
            rows.append((1, aa, bb, n))
            last = p_ + 1
        if run - last > 0:
            rows.append((run - last, 0, 0, n))
    return np.asarray(rows, dtype=np.int32)


def write_simulated(fn, model, theta, rho, L, n, seed=0, pid="pop1"):
    "Simulate and write one contig in SMC++ format."
    from . import format as fmt

    data = simulate_contig(model, theta, rho, L, n, seed)
    dist = [[["sim", 0], ["sim", 1]]]
    undist = [[["sim_u", i] for i in range(n)]]
    fmt.write_contig(fn, data, [pid], dist, undist)
    return fn


def simulate_joint_contig(model12, theta, rho, L, n1, n2, seed=0, M=24):
    """Simulate a two-population (a1=2) contig from the joint generative HMM:
    hidden TMRCA path from the pop-1 model's (pi, T), per-site observations
    from the theta-incorporated joint CSFS.

    Returns (rows, 7) int32: (span, a1, b1, n1, a2, b2, n2)."""
    from ..ops.jcsfs import JointCSFS

    rng = np.random.RandomState(seed)
    m1 = model12.model1
    hs = estimation.balance_hidden_states(m1, M)
    g = grid_mod.make_time_grid(m1.s, hs)
    a_vals = np.asarray(m1.stepwise_values(), dtype=np.float64)
    pi = np.asarray(ratefunc.initial_distribution(a_vals, g))
    T = np.asarray(transition.transition_matrix(a_vals, rho, g))

    jc = JointCSFS(n1, n2, 2, 0, hs, K=10, seed=seed)
    m2 = model12.model2
    J = jc.compute(
        (np.asarray(m1.stepwise_values(), np.float64), m1.s),
        (np.asarray(m2.stepwise_values(), np.float64), m2.s),
        model12.split,
    )  # (M, 3, (n1+1)(n2+1))
    em = np.asarray(csfs_mod.incorporate_theta(J, theta))

    # hidden path as runs
    Tn = T / T.sum(axis=1, keepdims=True)
    self_p = np.diag(Tn)
    jump = Tn.copy()
    np.fill_diagonal(jump, 0.0)
    jump /= jump.sum(axis=1, keepdims=True)
    states, lengths = [], []
    s = rng.choice(len(pi), p=pi / pi.sum())
    pos = 0
    while pos < L:
        run = min(rng.geometric(max(1.0 - self_p[s], 1e-12)), L - pos)
        states.append(s)
        lengths.append(run)
        pos += run
        if pos < L:
            s = rng.choice(len(pi), p=jump[s])

    D2 = n2 + 1
    nk = em.shape[1] * em.shape[2]
    rows = []
    nonseg = (0, 0, n1, 0, 0, n2)
    for s, run in zip(states, lengths):
        probs = np.maximum(em[s].ravel().astype(np.float64), 0)
        p_seg = 1.0 - probs[0] / probs.sum()
        k = rng.binomial(run, p_seg)
        if k == 0:
            rows.append((run,) + nonseg)
            continue
        positions = np.sort(rng.choice(run, size=k, replace=False))
        sp = probs.copy()
        sp[0] = 0.0
        sp /= sp.sum()
        cats = rng.choice(nk, size=k, p=sp)
        last = 0
        for p_, c in zip(positions, cats):
            gap = p_ - last
            if gap > 0:
                rows.append((gap,) + nonseg)
            a1_, rest = divmod(int(c), (n1 + 1) * D2)
            b1_, b2_ = divmod(rest, D2)
            rows.append((1, a1_, b1_, n1, 0, b2_, n2))
            last = p_ + 1
        if run - last > 0:
            rows.append((run - last,) + nonseg)
    return np.asarray(rows, dtype=np.int32)


def write_simulated_joint(fn, model12, theta, rho, L, n1, n2, seed=0):
    from . import format as fmt

    data = simulate_joint_contig(model12, theta, rho, L, n1, n2, seed)
    dist = [[["sim", 0], ["sim", 1]], []]
    undist = [[["u1", i] for i in range(n1)], [["u2", i] for i in range(n2)]]
    fmt.write_contig(fn, data, [model12.model1.pid, model12.model2.pid],
                     dist, undist)
    return fn
