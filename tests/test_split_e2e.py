"""Two-population end-to-end: vcf2smc (joint) -> marginal estimates -> split.

The example VCF's samples all come from one msprime population, so the
correct split estimate is (near) zero — the same sanity check the reference's
run_test_long.sh split invocation exercises.
"""

import argparse
import json
import os

import numpy as np
import pytest

from smcpp_tpu.data.vcf import SampleList, vcf2smc

EXAMPLE = "/root/reference/example/example.vcf.gz"


def make_args(**kw):
    d = dict(
        mu=1.25e-8, r=None, em_iterations=1, knots=4, spline="piecewise",
        polarization_error=0.5, unfold=False, w=100, thinning=None,
        timepoints=None, outdir=None, base="model", algorithm="L-BFGS-B",
        xtol=0.1, ftol=1e-4, regularization_penalty=6, lambda_=None,
        nonseg_cutoff=None, multi=False, cores=None, seed=0,
    )
    d.update(kw)
    return argparse.Namespace(**d)


@pytest.fixture(scope="module")
def twopop_data(tmp_path_factory):
    base = tmp_path_factory.mktemp("twopop")
    p1 = SampleList("pop1", ["msp_0", "msp_1", "msp_2"])
    p2 = SampleList("pop2", ["msp_3", "msp_4"])
    f1 = str(base / "p1.smc.gz")
    f2 = str(base / "p2.smc.gz")
    f12 = str(base / "p12.smc.gz")
    vcf2smc(EXAMPLE, f1, "1", p1)
    vcf2smc(EXAMPLE, f2, "1", p2)
    vcf2smc(EXAMPLE, f12, "1", p1, p2)
    return base, f1, f2, f12


def test_split_end_to_end(twopop_data):
    from smcpp_tpu.inference.analysis import Analysis
    from smcpp_tpu.inference.split import SplitAnalysis

    base, f1, f2, f12 = twopop_data
    np.random.seed(0)
    fits = {}
    for name, fn in [("p1", f1), ("p2", f2)]:
        out = str(base / name)
        os.makedirs(out, exist_ok=True)
        a = Analysis([fn], make_args(outdir=out))
        a.run()
        a.dump(os.path.join(out, "model.final"))
        fits[name] = os.path.join(out, "model.final.json")

    args = make_args(
        outdir=str(base / "split"), pop1=fits["p1"], pop2=fits["p2"]
    )
    os.makedirs(args.outdir, exist_ok=True)
    sa = SplitAnalysis([f12], args)
    sa.run(1)
    assert np.isfinite(sa.loglik())
    # same population -> split should come out very recent
    assert sa.model.split < 0.2 * sa._max_split
    sa.dump(os.path.join(args.outdir, "model.final"))
    d = json.load(open(os.path.join(args.outdir, "model.final.json")))
    assert d["model"]["class"] == "SMCTwoPopulationModel"


def test_twopop_posterior(twopop_data, tmp_path):
    "Two-population posterior decoding through the CLI."
    import numpy as np

    from smcpp_tpu.commands.main import main
    from smcpp_tpu.inference.analysis import Analysis

    base, f1, f2, f12 = twopop_data
    fit = base / "p1" / "model.final.json"
    if not fit.exists():
        np.random.seed(0)
        out = str(base / "p1")
        os.makedirs(out, exist_ok=True)
        a = Analysis([f1], make_args(outdir=out))
        a.run()
        a.dump(os.path.join(out, "model.final"))
    # decode the joint data with the one-pop model is invalid; build a joint
    # model json via split-style dict
    import json as _json

    from smcpp_tpu.models import SMCModel, SMCTwoPopulationModel

    d = _json.load(open(fit))
    m1 = SMCModel.from_dict(d["model"])
    m2 = SMCModel.from_dict(d["model"])
    m2._pid = "pop2"
    m1._pid = "pop1"
    jm = SMCTwoPopulationModel(m1, m2, float(m1.knots[-1]) / 2)
    jd = {
        "model": jm.to_dict(),
        "theta": d["theta"],
        "rho": d["rho"],
        "alpha": d["alpha"],
        "hidden_states": d["hidden_states"],
    }
    jfit = tmp_path / "joint.json"
    _json.dump(jd, open(jfit, "w"))
    out_npz = tmp_path / "post2.npz"
    main([
        "posterior", "--M", "8", str(jfit), str(out_npz), f12,
    ])
    z = np.load(out_npz)
    g = z[f12]
    assert g.shape[0] == 8
    assert np.all(np.isfinite(g))
