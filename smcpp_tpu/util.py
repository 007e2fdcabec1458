"""Misc utilities and demographic presets (mirrors smcpp/util.py)."""

import numpy as np


def cumsum0(ary):
    return np.concatenate([[0], np.cumsum(ary)])


def build_sawtooth():
    "MSMC supplemental section 7 sawtooth history (util.py:19-41)."
    sawtooth = {"a": [5.0], "b": [], "s": []}
    g_last = t_last = 0.0
    events = [
        (0.000582262, 1318.18),
        (0.00232905, -329.546),
        (0.00931919, 82.3865),
        (0.0372648, -20.5966),
        (0.149059, 5.14916),
        (0.596236, 0.0),
    ]
    for t, g in events:
        sawtooth["b"].append(sawtooth["a"][-1] * np.exp(g_last * (t_last - t)))
        sawtooth["a"].append(sawtooth["b"][-1])
        sawtooth["s"].append(t - t_last)
        g_last = g
        t_last = t
    sawtooth["b"].append(events[-1][0])
    sawtooth["s"].append(0.1)
    sawtooth = {k: np.array(v) for k, v in sawtooth.items()}
    sawtooth["s"] *= 2.0
    sawtooth["N0"] = 14312
    return sawtooth


sawtooth = build_sawtooth()

human = {
    "a": np.array([10.0, 0.5, 1.0, 4.0]),
    "b": np.array([1.0, 0.5, 1.0, 4.0]),
    "s": np.array([10000.0, 60000.0, 130000.0, 1.0]) / 20000.0 / 29.0,
    "N0": 10000.0,
}


def undistinguished_sfs(sfs, folded=False):
    "Marginalize an (a+1, n+1) CSFS onto total derived count (util.py:55-70)."
    sfs = np.asarray(sfs)
    a = sfs.shape[0] - 1
    n = sfs.shape[1] - 1
    usfs = np.zeros([n + a] + list(sfs.shape[2:]), dtype=sfs.dtype)
    for i in range(a + 1):
        for j in range(n + 1):
            if 0 <= i + j < n + a:
                usfs[i + j] = usfs[i + j] + sfs[i, j]
    if folded:
        ret = [usfs[0]]
        for i in range(1, -(-(n + a) // 2)):
            inds = list({i, n + a - i})
            ret.append(usfs[inds].sum(axis=0))
        usfs = np.array(ret, dtype=sfs.dtype)
    return usfs


def exp_piecewise_to_stepwise(a, b, s, pieces_per_epoch=40):
    "Discretize exponential-growth epochs to piecewise-constant (model.py:98-115)."
    ap, sp = [], []
    for aa, bb, ss, cs in zip(a, b, s, cumsum0(s)[:-1]):
        if aa == bb:
            ap.append(aa)
            sp.append(ss)
        else:
            s0 = cs if cs > 0 else 1e-5
            s1 = s0 + ss
            t = np.linspace(s0, s1, pieces_per_epoch)
            sp += np.diff(t).tolist()
            ap += (aa * (bb / aa) ** ((t[:-1] - s0) / (s1 - s0))).tolist()
    return np.array(ap), np.array(sp)
