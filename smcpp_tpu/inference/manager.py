"""Inference manager: one per population group.

Replaces the reference's C++ InferenceManager + Cython bridge
(/root/reference/src/inference_manager.cpp, smcpp/_smcpp.pyx) with a pair of
jitted programs:

* ``setup`` (float64, CPU backend): model params -> (pi, T, E) through the
  differentiable rate-function / transition / CSFS / emission pipeline.
* ``estep`` (float32, accelerator backend): padded span-compressed
  observations -> log-likelihood + sufficient statistics via the
  gradient-identity forward kernel (ops/hmm.py).

The M-step objective Q(y, theta, rho, alpha) re-runs only the setup pipeline
with the E-statistics held constant — exactly the reference's separation
(src/hmm.cpp:155-193: E-stats are constants in Q).
"""

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import defaults
from ..ops import csfs as csfs_mod
from ..ops import emission as em_mod
from ..ops import grid as grid_mod
from ..ops import hmm as hmm_mod
from ..ops import ratefunc, transition

logger = logging.getLogger(__name__)


def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


def pack_observations(data_list, key_id, chunk):
    """Map contig rows to key ids and pad into (C, Lmax) arrays.

    Rows with span == 0 / key 0 are padding (exact no-ops in the kernel).
    Spans wider than 2^24 - 1 windows are split to bound the
    binary-exponentiation depth.
    """
    MAXSPAN = (1 << 24) - 1
    spans_l, keys_l = [], []
    for d in data_list:
        s = d[:, 0].astype(np.int64)
        k = np.array([key_id[tuple(row)] for row in d[:, 1:]], dtype=np.int32)
        if s.max(initial=0) > MAXSPAN:
            reps = np.maximum(1, -(-s // MAXSPAN))
            k = np.repeat(k, reps)
            news = []
            for si, r in zip(s, reps):
                if r == 1:
                    news.append(si)
                else:
                    q, rem = divmod(si, r)
                    news.extend([q + 1] * rem + [q] * (r - rem))
            s = np.array(news, dtype=np.int64)
        spans_l.append(s.astype(np.int32))
        keys_l.append(k)
    C = len(spans_l)
    Lmax = max(len(s) for s in spans_l)
    Lmax = -(-Lmax // chunk) * chunk
    spans = np.zeros((C, Lmax), dtype=np.int32)
    keys = np.zeros((C, Lmax), dtype=np.int32)
    for i, (s, k) in enumerate(zip(spans_l, keys_l)):
        spans[i, : len(s)] = s
        keys[i, : len(k)] = k
    return spans, keys


class OnePopInferenceManager:
    def __init__(
        self,
        n,
        data_list,
        hidden_states,
        pid=None,
        polarization_error=0.5,
        chunk=64,
        compute_device=None,
        estep_dtype=jnp.float32,
    ):
        self.n = int(n)
        self.pid = pid
        self.hidden_states = np.asarray(hidden_states, dtype=np.float64)
        self._chunk = chunk
        self._estep_dtype = estep_dtype
        self._cpu = _cpu_device()
        self._device = compute_device or jax.devices()[0]

        all_keys = np.unique(
            np.concatenate([d[:, 1:] for d in data_list], axis=0), axis=0
        )
        self.em_idx = em_mod.build_emission_index(
            all_keys, self.n, na=2, polarization_error=polarization_error
        )
        spans, keys = pack_observations(
            data_list, self.em_idx.key_id(), chunk
        )
        self._nbits = max(1, int(spans.max()).bit_length())
        self._spans = jax.device_put(spans, self._device)
        self._keys = jax.device_put(keys, self._device)
        self._total_bases = float(sum(d[:, 0].sum() for d in data_list))
        logger.debug(
            "IM(pid=%s): %d contigs, padded L=%d, %d keys, nbits=%d",
            pid, spans.shape[0], spans.shape[1], self.em_idx.n_keys, self._nbits,
        )

        # mutable parameters
        self.model = None
        self.theta = None
        self.rho = None
        self.alpha = 1
        self.save_gamma = False
        self._grid = None
        self._stats = None
        self._ll = None
        self.gammas = None

        self._estep_fn = jax.jit(
            partial(hmm_mod.estep, nbits=self._nbits, chunk=self._chunk),
            device=self._device,
        )
        self._setup_cache = {}

    # ------------------------------------------------------------------
    def set_model(self, model):
        self.model = model
        g = grid_mod.make_time_grid(model.s, self.hidden_states)
        if self._grid is None or not np.array_equal(g.ts, self._grid.ts):
            self._grid = g
            self._setup_cache.clear()

    def _setup(self):
        """Jitted f64 programs for the current grid:

        - tensors(y, theta, rho, alpha) -> (pi, T, E)
        - q_value / q_value_and_grad: Q with E-statistics passed as arguments
          (so one compilation serves every EM iteration).
        """
        key = id(self._grid)
        if key not in self._setup_cache:
            grid, n, idx, model = self._grid, self.n, self.em_idx, self.model

            def fn(y, theta, rho, alpha):
                a = model.stepwise_values_fn(y)
                pi = ratefunc.initial_distribution(a, grid)
                T = transition.transition_matrix(a, rho, grid)
                bl = csfs_mod.conditioned_sfs(a, grid, n)
                em = csfs_mod.incorporate_theta(bl, theta)
                act = ratefunc.average_coal_times(a, grid)
                e2 = em_mod.e2_matrix(act, theta, alpha)
                E = em_mod.emission_matrix(idx, em, e2)
                return pi, T, E

            def q(y, theta, rho, alpha, gamma0, xisum, gamma_sums):
                pi, T, E = fn(y, theta, rho, alpha)
                return (
                    jnp.dot(gamma0, jnp.log(pi))
                    + jnp.sum(gamma_sums * jnp.log(E))
                    + jnp.sum(xisum * jnp.log(T))
                )

            self._setup_cache[key] = (
                jax.jit(fn, device=self._cpu),
                jax.jit(q, device=self._cpu),
                jax.jit(jax.value_and_grad(q, argnums=0), device=self._cpu),
            )
        return self._setup_cache[key]

    def tensors(self):
        fn, _, _ = self._setup()
        y = jnp.asarray(self.model.y, dtype=jnp.float64)
        return fn(y, self.theta, self.rho, self.alpha)

    # ------------------------------------------------------------------
    def E_step(self):
        pi, T, E = self.tensors()
        dt = self._estep_dtype
        pi_d = jax.device_put(jnp.asarray(pi, dt), self._device)
        T_d = jax.device_put(jnp.asarray(T, dt), self._device)
        E_d = jax.device_put(jnp.asarray(E, dt), self._device)
        ll, gamma0, xisum, gamma_sums = self._estep_fn(
            pi_d, T_d, E_d, self._spans, self._keys
        )
        self._ll = float(ll)
        self._stats = (
            np.asarray(gamma0, np.float64),
            np.asarray(xisum, np.float64),
            np.asarray(gamma_sums, np.float64),
        )
        if self.save_gamma:
            self.gammas = self._compute_gammas(pi_d, T_d, E_d)
        return self._ll

    def _compute_gammas(self, pi_d, T_d, E_d):
        fn = jax.jit(
            partial(
                hmm_mod.posterior_gammas, nbits=self._nbits, chunk=self._chunk
            ),
            device=self._device,
        )
        out = []
        for i in range(self._spans.shape[0]):
            g = fn(pi_d, T_d, E_d, self._spans[i], self._keys[i])
            out.append(np.asarray(g, np.float64))
        return out

    def loglik(self):
        return self._ll

    # ------------------------------------------------------------------
    def Q(self, y=None, theta=None, rho=None, alpha=None):
        """Q value at (possibly overridden) parameters, float.

        Q = gamma0 . log pi + sum gs * log E + sum xisum * log T
        (reference HMM::Q, hmm.cpp:155-193); E-statistics from the last
        E_step are constants."""
        _, q, _ = self._setup()
        return float(q(*self._q_args(y, theta, rho, alpha)))

    def Q_and_grad(self, y=None, theta=None, rho=None, alpha=None):
        "(Q, dQ/dy) at (possibly overridden) parameters."
        _, _, qvg = self._setup()
        v, g = qvg(*self._q_args(y, theta, rho, alpha))
        return float(v), np.asarray(g)

    def _q_args(self, y, theta, rho, alpha):
        gamma0, xisum, gamma_sums = self._stats
        return (
            jnp.asarray(self.model.y if y is None else y, jnp.float64),
            self.theta if theta is None else theta,
            self.rho if rho is None else rho,
            self.alpha if alpha is None else alpha,
            gamma0,
            xisum,
            gamma_sums,
        )

    @property
    def total_bases(self):
        return self._total_bases
