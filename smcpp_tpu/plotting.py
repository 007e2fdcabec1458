"""Size-history plotting (mirrors /root/reference/smcpp/plotting.py)."""

import json

import numpy as np


def pretty_plot():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    return fig, ax


def plot_psfs(psfs, xlim, ylim, xlabel, knots=False, logy=False, stats={}):
    import matplotlib.pyplot as plt
    from matplotlib import cycler

    fig, ax = pretty_plot()
    xmax = ymax = 0.0
    xmin = ymin = np.inf
    labels = []
    series = []
    data = [["label", "x", "y", "plot_type", "plot_num"]]

    def saver(f, ctr=[0]):
        def g(x, y, label, data=data, **kwargs):
            data.append([label, list(x), list(y), f.__name__, ctr[0]])
            ctr[0] += 1
            if label not in labels:
                labels.append(label)
                return f(x, y, label=label, **kwargs)
            return f(x, y, **kwargs)

        return g

    my_axplot = saver(ax.plot)
    my_axstep = saver(ax.step)
    for i, (label, d) in enumerate(psfs):
        N0 = d["N0"]
        g = d.get("g", None) or 1
        if "b" in d:
            a = d["a"]
            s = d["s"]
            b = d["b"]
            slope = np.log(a / b) / s
            cum = 0.0
            x = []
            y = []
            for aa, bb, ss in zip(b[:-1], slope[:-1], s[:-1]):
                tt = np.linspace(cum, cum + ss, 200)
                yy = aa * np.exp(bb * (cum + ss - tt))
                x = np.concatenate([x, tt])
                y = np.concatenate([y, yy])
                cum += ss
            x = np.concatenate([x, [cum, 2 * cum]])
            y = np.concatenate([y, [a[-1], a[-1]]])
            x *= 2 * N0 * g
            y *= N0
            my_axplot(x, y, label, linewidth=2)
        else:
            x = np.cumsum(d["s"]) * 2 * N0 * g
            y = np.asarray(d["a"]) * N0
            x = np.insert(x, 0, 0)
            y = np.insert(y, 0, y[0])
            my_axstep(x, y, label, linewidth=2, where="post")
        xmin = min(xmin, x[x > 0].min())
        xmax = max(xmax, x.max())
        ymin = min(ymin, y.min())
        ymax = max(ymax, y.max())
        if knots and "knots" in d:
            knotsx = np.asarray(d["knots"]) * 2 * N0 * g
            ax.scatter(knotsx, np.interp(knotsx, x, y), marker="x")
    ax.set_xscale("log")
    if logy:
        ax.set_yscale("log")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(r"$N_e$")
    if xlim:
        ax.set_xlim(*xlim)
    if ylim:
        ax.set_ylim(*ylim)
    if len(psfs) > 1:
        ax.legend(loc="best")
    return fig, data


def model_to_plot_dict(d):
    "Convert a model.final.json dict into plotting series."
    from .models import model_from_dict

    m = model_from_dict(d["model"])
    if d["model"]["class"] == "SMCTwoPopulationModel":
        out = []
        for pid in m.pids:
            mm = m.for_pop(pid)
            out.append(
                (pid, {
                    "N0": mm.N0,
                    "a": np.asarray(mm.stepwise_values()),
                    "s": mm.s,
                    "knots": mm.knots,
                })
            )
        return out
    return [
        (d["model"].get("pid") or "model", {
            "N0": m.N0,
            "a": np.asarray(m.stepwise_values()),
            "s": m.s,
            "knots": m.knots,
        })
    ]
