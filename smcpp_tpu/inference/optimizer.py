"""EM driver and M-step optimization.

Mirrors the reference's optimizer + plugin flow
(/root/reference/smcpp/optimize/optimizers.py, optimize/plugins/): per EM
iteration an E-step, scalar pre-M-step optimizations (rho, global scale),
then per-coordinate-block L-BFGS-B over the spline knot values with exact
gradients from ``jax.grad`` of Q.
"""

import logging
import os

import numpy as np
import scipy.optimize

from .. import defaults

logger = logging.getLogger(__name__)


class EMTerminationException(Exception):
    pass


class SMCPPOptimizer:
    def __init__(self, analysis, algorithm="L-BFGS-B", xtol=defaults.xtol,
                 ftol=defaults.ftol, single=True, learn_rho=False,
                 outdir=None, base="model"):
        self._analysis = analysis
        self._algorithm = algorithm
        self._xtol = xtol
        self._ftol = ftol
        self._force_sequential = False
        self._single = single
        self._learn_rho = learn_rho
        self._outdir = outdir
        self._base = base
        self._old_loglik = None
        self._radius = {}  # per-coordinate trust radius for scalar searches

    # -- coordinate schedule (optimizers.py:238-243)
    def _coordinates(self):
        K = self._analysis.model.K
        if self._single:
            return [[k] for k in range(K)][::-1]
        return [list(range(K))]

    # -- objective: -(Q - penalty * roughness) and gradient over coords
    def _f(self, x, coords):
        a = self._analysis
        y = a.model.y.copy()
        y[coords] = x
        q, grad = a.Q_and_grad(y)
        if np.isinf(q) or np.isnan(q):
            # candidate rejected, not silently: a persistent non-finite Q
            # means degenerate parameters (the E-step itself aborts loudly,
            # manager._check_finite)
            logger.debug(
                "non-finite Q at coords %s, x=%s; rejecting candidate",
                coords, np.asarray(x).round(3),
            )
            return np.inf, np.zeros(len(coords))
        return -q, -grad[coords]

    def _scalar_window(self, k, x0):
        """Search window for a single-knot scalar search: the +-3 hard
        bounds clipped to the per-coordinate trust radius (see _minimize)."""
        lo = max(x0 - 3.0, np.log(defaults.minimum))
        hi = min(x0 + 3.0, np.log(defaults.maximum))
        r = self._radius.get(k, 3.0)
        return max(lo, x0 - r), min(hi, x0 + r)

    def _prefetch_coarse(self):
        """Evaluate the coarse bracketing grids of ALL knot coordinates in
        ONE batched (accelerator) Q call, Jacobi-style: every grid is built
        around the iteration-start model.

        Rationale: each coordinate's coarse round is a separate accelerator
        dispatch whose latency is dominated by the device round trip (~30 ms
        through the TPU tunnel), and its search window [x0-r, x0+r] depends
        only on that coordinate's own value — never on the other
        coordinates' pending updates.  Only the Q *values* see a stale
        context, and the coarse round's sole job is to bracket the zoom
        window; every decision value is still the exact f64 host objective.
        _batched_argmax rejects a prefetched bracket whose argmax sits on a
        grid edge (the cheap symptom of stale-context drift) and redoes the
        coarse round fresh at the true context.  Gated to coordinates with a
        trust radius from a previous iteration (first-iteration moves are
        large, so couplings could mislead the bracket)."""
        a = self._analysis
        if not (self._single and getattr(a, "has_fast_batch", False)):
            return {}
        y0 = a.model.y.copy()
        ks = [c[0] for c in self._coordinates() if c[0] in self._radius]
        if not ks:
            return {}
        B = self._BATCH
        grids, rows = {}, []
        for k in ks:
            lo, hi = self._scalar_window(k, y0[k])
            xs = np.linspace(lo, hi, B)
            ys = np.tile(y0, (B, 1))
            ys[:, k] = xs
            grids[k] = xs
            rows.append(ys)
        vals = np.asarray(a.Q_batch(ys=np.concatenate(rows), coarse=True),
                          float)
        return {
            k: (grids[k], vals[i * B:(i + 1) * B]) for i, k in enumerate(ks)
        }

    def _fast_coordinate_pass(self, prefetch):
        """One-dispatch M-step knot update (round-4 M-step tail cut).

        When EVERY knot's prefetched coarse bracket has already converged
        (interior argmax, zoom window within the confirm threshold — the
        steady state after the first few EM iterations), the per-knot f64
        confirm grids are ~9 sequential host dispatches doing nothing but
        re-measuring a parabola vertex.  Instead: fit the parabola on each
        knot's PREFETCHED coarse values directly, then make all accept
        decisions with ONE batched f64 Q call (K candidate rows + the base
        row), plus one final f64 evaluation of the combined move.

        Decision values are always exact f64 — the f32 coarse values only
        POSITION the candidates (their vertex noise is within the +-w
        localization the coarse round provides anyway), so the fixed-point
        guarantees match the sequential path: a move is only ever accepted
        against a same-batch f64 baseline, and the combined move must beat
        the best single move or we fall back to that single move.

        Returns True when it handled the coordinate loop; False falls back
        to the sequential per-knot searches (first iterations, edge
        argmaxes, non-concave brackets, or SMCPP_TPU_FAST_COORD=0)."""
        if os.environ.get("SMCPP_TPU_FAST_COORD") == "0":
            return False
        coords = self._coordinates()
        if not (self._single and prefetch) or any(
            c[0] not in prefetch for c in coords
        ):
            return False
        a = self._analysis
        y0 = a.model.y.copy()
        cand = {}
        for c in coords:
            k = c[0]
            xs0, v0 = prefetch[k]
            v0 = np.where(np.isfinite(v0), v0, -np.inf)
            j = int(np.argmax(v0))
            if not (
                0 < j < len(xs0) - 1
                and np.isfinite(v0[j - 1 : j + 2]).all()
            ):
                # edge argmax or a non-finite NEIGHBOR (the parabola needs
                # the full triple): stale-drift/degeneracy symptom — redo
                # this iteration's knot loop sequentially
                return False
            w = xs0[1] - xs0[0]
            if 2.0 * w > 6.0 * self._xtol:
                return False  # bracket not converged: genuine zoom needed
            den = v0[j - 1] - 2.0 * v0[j] + v0[j + 1]
            if den < 0:
                xq = xs0[j] + 0.5 * w * (v0[j - 1] - v0[j + 1]) / den
                xq = float(np.clip(xq, xs0[j] - w, xs0[j] + w))
            else:
                xq = float(xs0[j])  # flat/convex triple: best grid point
            cand[k] = xq
        ks = sorted(cand)
        rows = np.tile(y0, (len(ks) + 1, 1))
        for i, k in enumerate(ks):
            rows[i, k] = cand[k]
        vals = np.asarray(a.Q_batch(ys=rows, coarse=False), float)
        vals = np.where(np.isfinite(vals), vals, -np.inf)
        v_base = vals[-1]
        acc = [i for i, k in enumerate(ks) if vals[i] > v_base]
        if acc:
            y_new = y0.copy()
            for i in acc:
                y_new[ks[i]] = cand[ks[i]]
            if len(acc) > 1:
                v_new = float(
                    np.asarray(a.Q_batch(ys=y_new[None], coarse=False),
                               float)[0]
                )
                if not (np.isfinite(v_new)
                        and v_new >= max(vals[i] for i in acc)):
                    # knot couplings hurt the combined move: take the best
                    # single accepted move (guaranteed > base)
                    i = max(acc, key=lambda i: vals[i])
                    y_new = y0.copy()
                    y_new[ks[i]] = cand[ks[i]]
            a.model.y = y_new
        for k in ks:
            self._radius[k] = min(
                3.0, max(4.0 * abs(cand[k] - y0[k]), 4.0 * self._xtol)
            )
        logger.debug(
            "fast coordinate pass: %d/%d moves accepted in one f64 batch",
            len(acc), len(ks),
        )
        return True

    # ------------------------------------------------------------------
    # round-5 unified M-step: ONE coarse dispatch for every scalar search
    # (rho, global scale, all K knots), batched f64 zoom rounds for the
    # few that need them, then ONE f64 decision batch.
    # ------------------------------------------------------------------
    def _unified_scalars(self, y0, rho0):
        """Scalar-search specs for one unified M-step round.

        Each spec is a dict with ``name`` (("knot", k) | ("scale",) |
        ("rho",)), the search window [lo, hi] (log-space for rho), the
        convergence tolerance ``xatol``, and ``x0`` (the current value in
        search coordinates)."""
        a = self._analysis
        out = []
        for c in self._coordinates():
            k = c[0]
            lo, hi = self._scalar_window(k, y0[k])
            out.append(dict(name=("knot", k), lo=lo, hi=hi,
                            xatol=self._xtol, x0=y0[k]))
        r = min(1.0, self._radius.get("scale", 1.0))
        out.append(dict(name=("scale",), lo=-r, hi=r,
                        xatol=self._xtol, x0=0.0))
        if self._learn_rho and rho0 is not None:
            th = a._theta
            llo, lhi = np.log(th / 100), np.log(th * 100)
            x0 = float(np.clip(np.log(rho0), llo, lhi))
            r = self._radius.get("rho", np.inf)
            out.append(dict(name=("rho",), lo=max(llo, x0 - r),
                            hi=min(lhi, x0 + r), xatol=0.02, x0=x0))
        return out

    def _unified_rows(self, y0, rho0, pts):
        """Candidate (ys, rhos) rows for a list of (spec, xs) grids.

        rhos is None when no rho rows are present (Q_batch then uses the
        manager's current rho for every row)."""
        ys, rhos, any_rho = [], [], False
        for s, xs in pts:
            kind = s["name"][0]
            for x in xs:
                y, rho = y0, rho0
                if kind == "knot":
                    y = y0.copy()
                    y[s["name"][1]] = x
                elif kind == "scale":
                    y = y0 + x
                else:
                    rho, any_rho = float(np.exp(x)), True
                ys.append(y)
                rhos.append(rho)
        return np.asarray(ys), (np.asarray(rhos) if any_rho else None)

    def _unified_mstep(self):
        """Jacobi-style one-round M-step (round-5; VERDICT r4 item 1).

        The sequential searches cost one accelerator/host dispatch per
        shrink round per scalar — ~10 dispatches per EM iteration even
        when the fast coordinate pass engages, and ~25 when it does not.
        This collapses the whole M-step to (steady state) THREE
        dispatches:

        1. ONE coarse f32 batch evaluating every scalar's bracketing grid
           (rho's geometric grid, the scale shifts, all K knot windows)
           around the iteration-start model — Jacobi, like the round-4
           coarse prefetch, but for every search;
        2. zero or more *batched* f64 zoom rounds over only the scalars
           whose bracket has not converged (at the default xtol even a
           full +-3 window converges at the first 24-point grid, so in
           steady state this is empty; rho needs two rounds on the first
           iteration while its trust radius is still the full 4-decade
           window — those rows ride the cheap shared-setup rho program
           when they are the only unconverged scalar);
        3. ONE f64 decision batch: every scalar's parabola-vertex
           candidate plus the base row.  A move is accepted only if it
           beats the base in the exact f64 objective (same fixed-point
           guarantee as the round-4 fast pass: coarse f32 values only
           POSITION candidates, never decide); with multiple acceptances
           one extra row checks the combined move against the best
           single.

        The round REPEATS (Gauss-Seidel at round granularity, re-reading
        the updated model) until its exact-f64 Q gain falls below
        ~ftol*|Q|/50 or _UNIFIED_MAX_ROUNDS: one Jacobi round maximizes
        Q far less than the reference's per-M-step L-BFGS (or the
        sequential per-coordinate Brent searches), and the 1 Gbp
        validation showed the EM ftol monitor then stops the whole fit
        early at a measurably worse point (single-round A/B: loglik
        -1216163 / median truth err 0.394 vs sequential -1212324 /
        0.241; multi-round restores parity — see
        benchmarks/results/large_fit_r5.json).  Steady state is still
        one round (the second round finds nothing to move and costs one
        coarse dispatch).

        The sequential machinery remains the fallback
        (SMCPP_TPU_UNIFIED_MSTEP=0, non-batched analyses, --multi) and
        the behavioral oracle.  Returns True when it handled the M-step
        (including rho/scale), False to run the sequential path.

        Reference analogue: the per-coordinate L-BFGS-B blocks of
        optimizers.py:164-183 + the rho/scale scalar plugins — all
        driven by the same Q objective (src/hmm.cpp:155-193)."""
        if os.environ.get("SMCPP_TPU_UNIFIED_MSTEP") == "0":
            return False
        if getattr(self, "_force_sequential", False):
            return False  # endgame: _check_termination switched us over
        n_prev = getattr(self, "_mstep_count", 0)
        self._mstep_count = n_prev + 1
        if n_prev == 0:
            # the FIRST M-step of an optimizer runs the sequential
            # (Gauss-Seidel) machinery: from a warm start every knot is
            # near its CONDITIONAL optimum, and the ridge direction out
            # of it needs the sequential cascade (each knot's search
            # seeing the previous knots' fresh moves) — the Jacobi pass
            # took near-zero strides here and committed the 1 Gbp fit to
            # a worse basin (round-5 regression hunt; validated in
            # benchmarks/results/large_fit_r5.json).
            return False
        a = self._analysis
        if not (self._single and getattr(a, "has_fast_batch", False)):
            return False
        self._unified_used = True
        for _ in range(self._UNIFIED_MAX_ROUNDS):
            moved, v_new, gain = self._unified_round()
            # a round whose own exact-f64 gain (accepted Q minus the
            # same-batch base row) is already below ~ftol|Q|/10 will not
            # seed a productive next round: stop here (the steady state
            # pays ONE round per M-step; the endgame switch to the
            # sequential machinery owns final convergence)
            if not moved or (
                v_new is not None
                and gain < self._ftol * abs(v_new) / 10.0
            ):
                break
        return True

    # Two rounds: one moving + one verify.  More mid-run Jacobi rounds
    # measured +0.34 s per EM iteration at C3 for marginal Q gains — the
    # fit-quality work lives in the sequential FIRST M-step and the
    # sequential ENDGAME switch, not in extra mid-run rounds.
    _UNIFIED_MAX_ROUNDS = 2

    def _unified_round(self):
        """One Jacobi round of the unified M-step (see _unified_mstep).
        Returns (moved, accepted f64 Q value or None)."""
        a = self._analysis
        y0 = a.model.y.copy()
        rho0 = float(a.rho) if self._learn_rho else None
        scalars = self._unified_scalars(y0, rho0)

        # --- round 0: one coarse dispatch for every scalar ---
        pts = [(s, np.linspace(s["lo"], s["hi"], self._BATCH))
               for s in scalars]
        ys, rhos = self._unified_rows(y0, rho0, pts)
        vals = np.asarray(a.Q_batch(ys=ys, rhos=rhos, coarse=True), float)
        off = 0
        live = []
        for s, xs in pts:
            s["xs"], s["vals"] = xs, np.where(
                np.isfinite(vals[off:off + len(xs)]),
                vals[off:off + len(xs)], -np.inf)
            off += len(xs)
            if np.isfinite(s["vals"]).any():
                live.append(s)
                # f32-noise-floor guard (1 Gbp regression, round 5): the
                # coarse f32 pipeline carries ~1e-7|Q| of tensor noise
                # (manager._setup_fast docstring).  When a scalar's whole
                # grid varies by less than ~30x that, its argmax/vertex
                # is positioned by NOISE — single-round A/B at 1 Gbp
                # converged 3.8k LL units short with visibly rougher
                # N(t) (truth err 0.394 vs 0.194 with f64 grids).  Flag
                # the scalar for one FULL-WINDOW f64 zoom round; early
                # iterations have large spreads and never pay this.
                fin = s["vals"][np.isfinite(s["vals"])]
                s["force_f64"] = bool(
                    fin.max() - fin.min()
                    < 3e-6 * max(abs(fin.max()), 1.0)
                )
            # a scalar whose whole grid is non-finite proposes no move

        # --- batched f64 zoom rounds for unconverged brackets ---
        def zoom_window(s):
            j = int(np.argmax(s["vals"]))
            w = s["xs"][1] - s["xs"][0]
            return (max(s["lo"], s["xs"][j] - w),
                    min(s["hi"], s["xs"][j] + w))

        for _ in range(4):
            todo = []
            for s in live:
                if s.pop("force_f64", False):
                    # keep the full window: the f32 argmax is noise, so
                    # shrinking around it would discard the real optimum
                    todo.append(s)
                    continue
                lo, hi = zoom_window(s)
                if hi - lo > 6.0 * s["xatol"]:
                    s["lo"], s["hi"] = lo, hi
                    todo.append(s)
            if not todo:
                break
            pts = [(s, np.linspace(s["lo"], s["hi"], self._BATCH_ZOOM))
                   for s in todo]
            if all(s["name"][0] == "rho" for s in todo):
                # rho-only zoom: the shared-setup program (one CSFS
                # setup + a vmapped transition per candidate)
                xs = pts[0][1]
                vals = np.asarray(a.Q_batch(rhos=np.exp(xs)), float)
            else:
                ys, rhos = self._unified_rows(y0, rho0, pts)
                vals = np.asarray(a.Q_batch(ys=ys, rhos=rhos), float)
            off = 0
            for s, xs in pts:
                s["xs"], s["vals"] = xs, np.where(
                    np.isfinite(vals[off:off + len(xs)]),
                    vals[off:off + len(xs)], -np.inf)
                off += len(xs)

        # --- parabola-vertex candidate per scalar ---
        cands = []
        for s in live:
            xs, v = s["xs"], s["vals"]
            j = int(np.argmax(v))
            w = xs[1] - xs[0]
            xq = xs[j]
            if 0 < j < len(xs) - 1 and np.isfinite(v[j - 1: j + 2]).all():
                den = v[j - 1] - 2.0 * v[j] + v[j + 1]
                if den < 0:
                    xq = xs[j] + 0.5 * w * (v[j - 1] - v[j + 1]) / den
                    xq = float(np.clip(xq, xs[j] - w, xs[j] + w))
            s["cand"] = xq
            # Keep even sub-xatol vertices as candidates: at the 1 Gbp
            # scale EVERY knot's conditional optimum sits 0.002-0.04 from
            # x0 (the warm start is near per-coordinate-optimal and all
            # progress is small coordinated ridge moves), and a 0.25*xatol
            # floor silently discarded all of them — the M-step stalled
            # from iteration 0 and the EM ftol monitor ended the fit 3.8k
            # LL units short (round-5 regression hunt).  The exact-f64
            # decision batch rejects genuine vertex noise at ~4 ms/row;
            # only sub-1e-3-of-xatol jitter is skipped.
            if abs(xq - s["x0"]) > 1e-3 * s["xatol"]:
                cands.append(s)

        # trust radii from the proposed moves (accepted or not), exactly
        # as the round-4 fast pass: a clamped move regrows next iteration
        for s in live:
            key = (s["name"][-1] if s["name"][0] == "knot"
                   else s["name"][0])
            self._radius[key] = min(3.0, max(
                4.0 * abs(s.get("cand", s["x0"]) - s["x0"]),
                4.0 * s["xatol"]))

        if not cands:
            return False, None, 0.0  # fully converged: nothing moved
        # --- ONE f64 decision batch: candidates + base row ---
        pts = [(s, [s["cand"]]) for s in cands]
        ys, rhos = self._unified_rows(y0, rho0, pts)
        ys = np.concatenate([ys, y0[None]])
        if rhos is not None:
            rhos = np.concatenate([rhos, [rho0]])
        vals = np.asarray(a.Q_batch(ys=ys, rhos=rhos), float)
        vals = np.where(np.isfinite(vals), vals, -np.inf)
        v_base = vals[-1]
        acc = [i for i in range(len(cands)) if vals[i] > v_base]
        if not acc:
            return False, None, 0.0

        def apply(idxs):
            y = y0.copy()
            rho = None
            for i in idxs:
                s = cands[i]
                kind = s["name"][0]
                if kind == "scale":
                    mask = np.ones(len(y), bool)
                    for j in idxs:
                        if cands[j]["name"][0] == "knot":
                            mask[cands[j]["name"][1]] = False
                    y[mask] += s["cand"]
                elif kind == "knot":
                    y[s["name"][1]] = s["cand"]
                else:
                    rho = float(np.exp(s["cand"]))
            return y, rho

        best = max(acc, key=lambda i: vals[i])
        v_accept = float(vals[best])
        y_new, rho_new = apply(acc)
        if len(acc) > 1:
            v_comb = np.asarray(
                a.Q_batch(
                    ys=y_new[None],
                    rhos=None if rho_new is None else np.array([rho_new]),
                ), float)[0]
            if not (np.isfinite(v_comb) and v_comb >= vals[best]):
                # couplings hurt the combined move: take the best single
                y_new, rho_new = apply([best])
            else:
                v_accept = float(v_comb)
        a.model.y = y_new
        if rho_new is not None:
            logger.info("New rho: %g", rho_new)
            a.rho = rho_new
        logger.debug(
            "unified M-step round: %d/%d scalars moved (Q=%.6g)",
            len(acc), len(cands), v_accept,
        )
        return True, v_accept, v_accept - float(v_base)

    def _minimize(self, x0, coords, coarse0=None):
        bounds = np.transpose(
            [
                np.maximum(x0 - 3.0, np.log(defaults.minimum)),
                np.minimum(x0 + 3.0, np.log(defaults.maximum)),
            ]
        )
        if os.environ.get("SMCPP_GRADIENT_CHECK"):
            y0, dy = self._f(x0, coords)
            for i in range(len(x0)):
                x0[i] += 1e-8
                y1, _ = self._f(x0, coords)
                logger.info("grad check %d: fd=%g ad=%g", i, (y1 - y0) * 1e8, dy[i])
                x0[i] -= 1e-8
        if len(x0) > 1:
            if self._algorithm == "Powell":
                # gradient-free, as in the reference (optimizers.py:82)
                res = scipy.optimize.minimize(
                    lambda x: self._f(x, coords)[0],
                    x0,
                    bounds=bounds,
                    method="Powell",
                )
            else:
                res = scipy.optimize.minimize(
                    self._f,
                    x0,
                    jac=True,
                    args=(coords,),
                    bounds=bounds,
                    method=self._algorithm,
                )
        else:
            # value-only objective: the bounded scalar search never uses the
            # gradient, so skip the backward pass
            a = self._analysis
            lo, hi = bounds[0]
            if getattr(a, "has_fast_batch", False):
                y0 = a.model.y.copy()
                # per-coordinate trust radius: knots move less and less as
                # EM converges, so span the search around the previous
                # move instead of the full +-3 window (the window is
                # re-centered every iteration, so a clamped move simply
                # grows the radius back next time)
                lo, hi = self._scalar_window(coords[0], x0[0])

                def fb(xs, coarse=False):
                    ys = np.tile(y0, (len(xs), 1))
                    ys[:, coords[0]] = xs
                    return a.Q_batch(ys=ys, coarse=coarse)

                x, _ = self._batched_argmax(fb, lo, hi, self._xtol,
                                            coarse0=coarse0)
                if x is None:
                    x = x0[0]
                self._radius[coords[0]] = min(
                    3.0, max(4.0 * abs(x - x0[0]), 4.0 * self._xtol)
                )
                res = scipy.optimize.OptimizeResult(x=np.array([x]))
            else:

                def f1(x):
                    y = a.model.y.copy()
                    y[coords] = x
                    q = a.Q(y=y)
                    return np.inf if not np.isfinite(q) else -q

                res = scipy.optimize.minimize_scalar(
                    f1,
                    bounds=(lo, hi),
                    method="bounded",
                    options={"xatol": self._xtol},
                )
                res.x = np.array([res.x])
        return res

    # -- batched scalar maximization: one vmapped Q per shrink round
    _BATCH = 24  # first-round grid width
    # zoomed/confirmation rounds are ODD so the previous round's best point
    # lies exactly on the new grid (its value re-measured in f64)
    _BATCH_ZOOM = 13  # genuine zoom rounds: span still wide
    # f64 confirmation when the coarse round converged: exactly the triple
    # the parabolic refinement needs — the f64 host objective costs
    # ~4.5 ms per extra candidate and the confirm grids are the single
    # largest steady-state M-step term (9 x 29 ms at width 5, C3 scale)
    _BATCH_CONFIRM = 3

    def _batched_argmax(self, f_batch, lo, hi, xatol, log=False,
                        max_rounds=6, coarse0=None):
        """Maximize a scalar objective by shrinking-grid search.

        Each round evaluates a B-point grid with ONE batched Q call
        (analysis.Q_batch), then zooms to +-1 grid spacing around the best
        point.  Resolution after r rounds is span * prod(2/(B_r - 1)), so
        1-2 rounds beat the ~12 sequential evaluations of a golden-section
        search at a fraction of the wall time.  Once the grid spacing is
        within ~3x of xatol, a quadratic fit through the best point and
        its neighbors recovers sub-grid resolution; the vertex candidate
        is verified with one extra (single-point) evaluation so the
        returned value never regresses below the best measured point.
        With ``log=True`` the grid is geometric (for rho's multi-decade
        range)."""
        if log:
            lo, hi = np.log(lo), np.log(hi)
        best_x, best_v = None, -np.inf
        xs = vals = None
        B = self._BATCH
        start = 0
        if coarse0 is not None and not log:
            # prefetched coarse bracket (see _prefetch_coarse): accept it in
            # place of the round-0 dispatch unless its argmax sits on a grid
            # edge — the detectable symptom of stale-context drift (an
            # interior bracket whose values merely shifted still contains
            # the optimum of the true context to within one grid spacing,
            # which is all a coarse round ever guarantees)
            xs0, v0 = coarse0
            v0 = np.where(np.isfinite(v0), v0, -np.inf)
            j = int(np.argmax(v0))
            if 0 < j < len(xs0) - 1 and np.isfinite(v0[j]):
                w = xs0[1] - xs0[0]
                lo, hi = max(lo, xs0[j] - w), min(hi, xs0[j] + w)
                B = (
                    self._BATCH_CONFIRM
                    if hi - lo <= 6.0 * xatol
                    else self._BATCH_ZOOM
                )
                start = 1
        for r in range(start, max_rounds):
            xs = np.linspace(lo, hi, B)
            # Round 0 may run on the accelerator's f32 objective: its wide
            # grid's signal dwarfs the f32 noise, so it is used only to
            # BRACKET the zoom window.  Zoom rounds and the refinement
            # below always use the exact f64 host objective, and coarse
            # values never enter best_v — mixing f32 and f64 values (or
            # finishing a search at f32) measurably degraded EM fixed
            # points (~400 LL units on the sawtooth validation).
            coarse = r == 0
            vals = np.asarray(
                f_batch(np.exp(xs) if log else xs, coarse=coarse), float
            )
            vals = np.where(np.isfinite(vals), vals, -np.inf)
            j = int(np.argmax(vals))
            if not coarse and vals[j] > best_v:
                best_v, best_x = float(vals[j]), xs[j]
            w = (hi - lo) / (B - 1)
            lo, hi = max(lo, xs[j] - w), min(hi, xs[j] + w)
            if not coarse and hi - lo <= 6.0 * xatol:
                break
            if coarse and not np.isfinite(vals[j]):
                break  # every coarse candidate non-finite; nothing to zoom
            # when the coarse round already localized the bracket, the
            # mandatory f64 follow-up is a cheap confirmation grid (its
            # count is what the host pays for); genuine zooms stay wide
            B = (
                self._BATCH_CONFIRM
                if coarse and hi - lo <= 6.0 * xatol
                else self._BATCH_ZOOM
            )
        if best_x is None:  # every candidate non-finite; caller keeps x0
            return None, -np.inf
        if hi - lo > xatol:
            # quadratic vertex through the final grid's best triple
            j = int(np.argmax(vals))
            if 0 < j < len(xs) - 1 and np.isfinite(vals[j - 1]) and np.isfinite(
                vals[j + 1]
            ):
                den = vals[j - 1] - 2.0 * vals[j] + vals[j + 1]
                if den < 0:  # concave
                    w = xs[1] - xs[0]
                    xq = xs[j] + 0.5 * w * (vals[j - 1] - vals[j + 1]) / den
                    if abs(xq - best_x) > 1e-12:
                        vq = float(
                            np.asarray(
                                f_batch(
                                    np.exp([xq]) if log else np.array([xq]),
                                    coarse=False,
                                ),
                                float,
                            )[0]
                        )
                        if np.isfinite(vq) and vq > best_v:
                            best_v, best_x = vq, xq
        return (np.exp(best_x) if log else best_x), best_v

    # -- scalar pre-M-step optimizations
    def _optimize_param(self, param, bounds):
        "plugins/parameter_optimizer.py"
        a = self._analysis
        if param == "split" and getattr(a, "has_split_batch", False):
            # traced-grid split search (VERDICT r1 item 9): the whole
            # candidate grid is ONE vmapped JCSFS/CSFS program per manager
            # (ops/split_objective.py) instead of an eager rebuild per
            # candidate; the parabolic refinement in _batched_argmax gives
            # sub-grid resolution on the smooth deterministic objective.
            lo = max(bounds[0], 1e-3 * bounds[1])
            x, _ = self._batched_argmax(
                lambda xs, coarse=False: a.Q_split_batch(xs), lo, bounds[1],
                xatol=1e-4 * bounds[1],
            )
            if x is not None:
                logger.info("New %s: %g", param, x)
                a.split = float(x)
            return
        if param == "rho" and getattr(a, "has_fast_batch", False):
            # geometric grid over the multi-decade rho range, one vmapped
            # Q per shrink round
            x, _ = self._batched_argmax(
                lambda xs, coarse=False: a.Q_batch(rhos=xs, coarse=coarse),
                bounds[0], bounds[1],
                xatol=0.02, log=True,
            )
            if x is not None:
                logger.info("New %s: %g", param, x)
                setattr(a, param, float(x))
            return

        def f(x):
            return -a.Q(**{param: x})

        res = scipy.optimize.minimize_scalar(f, bounds=bounds, method="bounded")
        logger.info("New %s: %g", param, res.x)
        setattr(a, param, res.x)

    def _optimize_scale(self):
        "plugins/scale_optimizer.py: global additive shift of log N."
        a = self._analysis
        y0 = a.model.y.copy()
        if getattr(a, "has_fast_batch", False):
            x, _ = self._batched_argmax(
                lambda xs, coarse=False: a.Q_batch(
                    ys=y0[None, :] + xs[:, None], coarse=coarse),
                -1.0, 1.0, self._xtol,
            )
            if x is not None:
                a.model.y = y0 + x
            return

        def f(shift):
            return -a.Q(y=y0 + shift)

        res = scipy.optimize.minimize_scalar(f, bounds=(-1.0, 1.0), method="bounded")
        a.model.y = y0 + res.x

    # -- EM loop (optimizers.py:154-188)
    def _occupancy_diagnostics(self):
        "plugins/hidden_state_occupancy.py: xisum occupancy + perplexity."
        import numpy as np

        for pid, im in self._analysis._ims.items():
            if im._stats is None:
                continue
            _, xisum, _ = im._stats
            occ = xisum.sum(axis=1)
            tot = occ.sum()
            if tot <= 0:
                continue
            p = occ / tot
            perp = float(
                np.exp(-np.sum(np.where(p > 0, p * np.log(np.maximum(p, 1e-300)), 0.0)))
            ) / len(p)
            logger.debug("hidden state occupancy (%s): %s", pid, p.round(3))
            if perp < defaults.perplexity_threshold:
                logger.warning(
                    "Posterior concentrated in few hidden states "
                    "(perplexity %.2f); consider different time points.", perp
                )

    def _maybe_raise_precision(self, ll):
        """bf16 auto-fallback (VERDICT r1 item 5).  The default E-step runs
        bf16 matmul passes (~2.6e-4 relative LL noise, ops/window_kernel.py).
        Exact EM cannot decrease the likelihood, so a decrease beyond the
        convergence tolerance is treated as precision noise: escalate one
        rung on manager.PRECISION_LADDER and redo the E-step.  (The
        reference pins exact f32 forward unconditionally, include/hmm.h:35.)"""
        old = self._old_loglik
        if old is None or ll >= old - self._ftol * abs(old):
            return ll
        raiser = getattr(self._analysis, "raise_precision", None)
        if raiser is None or not raiser():
            return ll
        logger.warning(
            "Loglik decreased (%f -> %f) beyond tolerance; re-running the "
            "E-step at higher matmul precision", old, ll,
        )
        self._analysis.E_step()
        return self._analysis.loglik()

    def run(self, niter):
        try:
            for i in range(niter):
                self._analysis.E_step()
                self._occupancy_diagnostics()
                ll = self._maybe_raise_precision(self._analysis.loglik())
                self._check_termination(ll)
                if self._outdir:
                    self._analysis.dump(
                        os.path.join(self._outdir, f".{self._base}.iter{i}")
                    )
                if not self._unified_mstep():
                    if self._learn_rho:
                        th = self._analysis._theta
                        self._optimize_param("rho", (th / 100, th * 100))
                    self._optimize_scale()
                    prefetch = self._prefetch_coarse()
                    if not self._fast_coordinate_pass(prefetch):
                        for coords in self._coordinates():
                            x0 = self._analysis.model.y[coords]
                            res = self._minimize(
                                x0, coords, coarse0=prefetch.get(coords[0])
                            )
                            self._analysis.model.y[coords] = res.x
                if logger.isEnabledFor(logging.DEBUG):
                    logger.debug(
                        "size history after iteration %d:\n%s",
                        i, ascii_size_history(self._analysis.model),
                    )
        except EMTerminationException:
            pass
        if self._outdir:
            self._analysis.dump(os.path.join(self._outdir, f"{self._base}.final"))

    def _check_termination(self, ll):
        "plugins/loglikelihood_monitor.py"
        if self._old_loglik is None:
            logger.info("Loglik: %f", ll)
        else:
            improvement = (self._old_loglik - ll) / self._old_loglik
            logger.info(
                "New loglik: %f\t(old: %f [%f%%])",
                ll, self._old_loglik, 100.0 * improvement,
            )
            if improvement < 0:
                logger.warning("Loglik decreased")
            elif improvement < self._ftol:
                if getattr(self, "_unified_used", False) and not getattr(
                    self, "_force_sequential", False
                ):
                    # The fast Jacobi M-step makes smaller per-iteration
                    # strides than the Gauss-Seidel sequential machinery
                    # (small coordinated ridge moves don't survive
                    # per-coordinate rounds) — at 1 Gbp scale it tripped
                    # this monitor on ITERATION ONE, ending the fit 3.8k
                    # LL units and 2x the truth error short.  Switch the
                    # endgame to the sequential M-step instead of
                    # terminating; EM ends when THAT stalls too.
                    logger.info(
                        "improvement < tol under the unified M-step; "
                        "switching to the sequential M-step for final "
                        "convergence"
                    )
                    self._force_sequential = True
                else:
                    logger.info(
                        "Log-likelihood improvement < tol; terminating"
                    )
                    self._old_loglik = ll
                    raise EMTerminationException()
        self._old_loglik = ll


class TwoPopulationOptimizer(SMCPPOptimizer):
    "Split-time-only optimization (optimizers.py:246-260)."

    def __init__(self, *args, max_split=None, **kwargs):
        super().__init__(*args, **kwargs)
        self._max_split = max_split

    def _coordinates(self):
        return []

    def run(self, niter):
        try:
            for i in range(niter):
                self._analysis.E_step()
                ll = self._maybe_raise_precision(self._analysis.loglik())
                self._check_termination(ll)
                self._optimize_param("split", (0.0, self._max_split))
        except EMTerminationException:
            pass
        if self._outdir:
            self._analysis.dump(os.path.join(self._outdir, f"{self._base}.final"))


def ascii_size_history(model, width=60, height=10):
    """Text rendering of N(t) for the EM log (parity with the reference's
    gnuplot ascii_plotter plugin, without the gnuplot dependency)."""
    import numpy as np

    t = np.cumsum(model.s)
    v = np.log10(np.asarray(model.stepwise_values(), dtype=float))
    cols = np.linspace(0, len(t) - 1, width).astype(int)
    vv = v[cols]
    lo, hi = vv.min(), vv.max()
    if hi - lo < 1e-3:
        hi = lo + 1e-3
    rows = np.clip(((vv - lo) / (hi - lo) * (height - 1)).round(), 0, height - 1)
    grid = [[" "] * width for _ in range(height)]
    for x, r in enumerate(rows.astype(int)):
        grid[height - 1 - r][x] = "*"
    lines = ["%6.2f |%s" % (hi - (hi - lo) * i / (height - 1), "".join(row))
             for i, row in enumerate(grid)]
    lines.append("       +" + "-" * width)
    lines.append("        log10(N/2N0) vs t in (%.3g, %.3g) coalescent units"
                 % (t[0], t[-1]))
    return "\n".join(lines)
