"""Two-population split-time estimation.

Mirrors /root/reference/smcpp/analysis/split.py: loads the two marginal
fits, builds an SMCTwoPopulationModel with split initialized at
max_split / 2, and runs one EM iteration where only the split time is
optimized by bounded scalar search (TwoPopulationOptimizer).
"""

import json
import logging

import numpy as np

from ..data import filters as df
from ..models import SMCModel, SMCTwoPopulationModel, model_from_dict
from .analysis import BaseAnalysis
from .manager import OnePopInferenceManager, TwoPopInferenceManager
from .optimizer import TwoPopulationOptimizer

logger = logging.getLogger(__name__)


class SplitAnalysis(BaseAnalysis):
    # host-local ingestion works here too: the split search runs on
    # trivial hidden states (M = 1), whose closed-form E-step consumes
    # only the globally all-reduced key counts — every process computes
    # the identical split objective from its own contig shard
    supports_hostlocal = True

    def __init__(self, files, args):
        super().__init__(files, args)
        assert self.npop == 2, "split requires two-population data"
        self._init_model(args.pop1, args.pop2)
        if self._headers is not None:
            has_joint = any(len(pid) == 2 for pid, _n, _a in self._headers)
        else:
            has_joint = any(c.npop == 2 for c in self.contigs)
        if not has_joint:
            raise RuntimeError(
                "Data contains no joint frequency spectrum information."
            )
        # the reference uses trivial hidden states for the split search
        # (analysis/split.py:23-25)
        self.hidden_states = np.array([0.0, np.inf])
        self._init_inference_manager(
            args.polarization_error, self.hidden_states
        )
        self._optimizer = TwoPopulationOptimizer(
            self,
            ftol=args.ftol,
            xtol=args.xtol,
            outdir=getattr(args, "outdir", None),
            base=getattr(args, "base", "model"),
            max_split=self._max_split,
        )
        self._niter = 1

    def _init_model(self, pop1, pop2):
        d = json.load(open(pop1))
        self._theta = d["theta"]
        self._rho = d["rho"]
        m1 = model_from_dict(d["model"])
        d2 = json.load(open(pop2))
        m2 = model_from_dict(d2["model"])
        assert d2["theta"] == self._theta
        self._max_split = m2._knots[-1]
        self._model = SMCTwoPopulationModel(m1, m2, self._max_split * 0.5)

    def _init_inference_manager(self, polarization_error, hs):
        d = {}
        max_n = {}
        a_by_pid = {}
        if self._headers is not None:
            # global pid universe / sample maxima / distinguished layout
            # from the one-line headers: every process must construct the
            # same managers in the same (global file) order even when its
            # local shard misses a pid entirely (parallel/hostlocal.py)
            for pid, n, a in self._headers:
                d.setdefault(pid, [])
                cur = max_n.setdefault(pid, np.zeros(len(n), dtype=int))
                max_n[pid] = np.maximum(cur, n)
                a_by_pid.setdefault(pid, set()).add(tuple(a))
        for c in self.contigs:
            d.setdefault(c.pid, []).append(c)
            cur = max_n.setdefault(c.pid, np.zeros(len(c.n), dtype=int))
            max_n[c.pid] = np.maximum(cur, c.n)
            a_by_pid.setdefault(c.pid, set()).add(tuple(c.a))
        self._ims = {}
        for pid in d:
            data = [c.data for c in d[pid]]
            prec = getattr(self._args, "precision", None)
            if len(pid) == 1:
                im = OnePopInferenceManager(
                    max_n[pid][0], data, hs, pid, polarization_error,
                    precision=prec, local_data=self._hostlocal,
                )
            else:
                avals = a_by_pid[pid]
                assert len(avals) == 1
                a1, a2 = avals.pop()
                n1, n2 = max_n[pid]
                im = TwoPopInferenceManager(
                    n1, n2, a1, a2, data, hs, pid, polarization_error,
                    precision=prec, local_data=self._hostlocal,
                )
            im.set_model(self._model)
            im.theta = self._theta
            im.rho = self._rho
            im.alpha = self._alpha = 1
            self._ims[pid] = im

    # split plumbing used by the scalar optimizer
    @property
    def split(self):
        return self._model.split

    @split.setter
    def split(self, x):
        self._model.split = x

    def Q(self, y=None, theta=None, rho=None, alpha=None, split=None):
        if split is not None:
            self._model.split = split
        return sum(im.Q() for im in self._ims.values())

    # -- traced split search (VERDICT r1 item 9) -----------------------
    @property
    def has_split_batch(self):
        "Every manager's split dependence is traced (trivial hs + stats)."
        return all(
            im._stats is not None and len(im.hidden_states) == 2
            for im in self._ims.values()
        )

    def _split_parts(self):
        """(constant, [traced objectives]) decomposition of Q(split).

        Joint managers use the traced JCSFS objective; the pop-2 marginal
        manager the traced splice objective; the pop-1 marginal is
        independent of the split and contributes a constant."""
        const = 0.0
        objs = []
        pid1 = self._model.pids[0]
        for im in self._ims.values():
            if isinstance(im, TwoPopInferenceManager):
                objs.append(im.split_objective())
            elif im.pid == (pid1,):
                const += im.Q()
            else:
                objs.append(im.marginal_split_objective())
        return const, objs

    def Q_split_batch(self, splits):
        "Q at a batch of split candidates, one vmapped evaluation per part."
        const, objs = self._split_parts()
        tot = np.full(len(splits), const)
        for o in objs:
            tot = tot + o.q_batch(splits)
        return tot

    def Q_split_and_grad(self, split):
        "(Q, dQ/dsplit) of the full objective at one split value."
        const, objs = self._split_parts()
        q, g = const, 0.0
        for o in objs:
            qi, gi = o.q_and_grad(split)
            q += qi
            g += gi
        return q, g
