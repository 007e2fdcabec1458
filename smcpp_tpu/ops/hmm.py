"""HMM forward pass and E-step sufficient statistics — the TPU hot path.

Design (replaces the reference's per-key eigensystems, span_Qs
divided-difference algebra and hand-written backward pass,
src/hmm.cpp + src/transition_bundle.cpp, with a single differentiable
forward program):

* Observations are span-compressed rows (span_l, key_l).  Each row's
  transfer operator A_l = (diag(E[key_l]) @ T^T)^{span_l} is computed by
  **binary exponentiation with per-step rescaling** — a fixed number of
  batched MxM matmuls, perfectly batched over rows (MXU work, no data
  dependence).
* Rows are grouped into chunks of G; each chunk's operator product is
  computed by a **tree reduction** (log2 G batched matmul levels).  Only the
  per-chunk products are carried by the sequential scan, so the sequential
  depth is L/G instead of L.
* The log-likelihood is the only forward output.  All E-step sufficient
  statistics fall out of ``jax.grad`` via the exponential-family identities

      xisum      = T  * d logL / d T        (expected transition counts)
      gamma_sums = E  * d logL / d E        (expected per-key state counts)
      gamma0     = pi * d logL / d pi       (posterior at position 0)

  which are exactly the quantities the reference's backward pass accumulates
  (hmm.cpp:97-153).  jax.checkpoint over chunks keeps backward memory at
  O(L/G * M^2) + O(G * M^2) recompute.

Rows with span == 0 are exact no-ops (A = I) and serve as padding.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _rescale(mat, logs):
    "Normalize by the max-abs entry, tracking log scale.  (..., M, M)"
    m = jnp.max(jnp.abs(mat), axis=(-2, -1), keepdims=True)
    m = jnp.maximum(m, jnp.finfo(mat.dtype).tiny)
    return mat / m, logs + jnp.log(m[..., 0, 0])


def _row_operator(B, span, nbits):
    "(diag(e) T^T)^span by binary exponentiation with rescaling.  B: (M, M)."
    M = B.shape[-1]
    eye = jnp.eye(M, dtype=B.dtype)
    zero = jnp.zeros((), dtype=B.dtype)

    def body(i, st):
        R, logR, Bc, logBc = st
        bit = ((span >> i) & 1) == 1
        Rn = jnp.where(bit, Bc @ R, R)
        logRn = jnp.where(bit, logR + logBc, logR)
        Rn, logRn = _rescale(Rn, logRn)
        Bc2, logBc2 = _rescale(Bc @ Bc, 2.0 * logBc)
        return Rn, logRn, Bc2, logBc2

    R, logR, _, _ = jax.lax.fori_loop(0, nbits, body, (eye, zero, B, zero))
    return R, logR


def _tree_reduce(As, logs):
    """Ordered product As[G-1] @ ... @ As[0] by pairwise tree reduction.

    As: (G, M, M) with G a power of two.  Returns ((M, M), scalar log).
    """
    G = As.shape[0]
    assert G & (G - 1) == 0, "chunk size must be a power of two"
    while G > 1:
        As, logs = _rescale(
            jnp.einsum("gij,gjk->gik", As[1::2], As[0::2]), logs[0::2] + logs[1::2]
        )
        G //= 2
    return As[0], logs[0]


@partial(jax.checkpoint, static_argnums=(4,))
def _chunk_product(T, E, spans, keys, nbits):
    "Transfer-operator product over one chunk of compressed rows."
    Tt = T.T
    B = E[keys][:, :, None] * Tt[None]  # (G, M, M)
    As, logs = jax.vmap(lambda b, s: _row_operator(b, s, nbits))(B, spans)
    return _tree_reduce(As, logs)


def forward_loglik(pi, T, E, spans, keys, nbits, chunk):
    """Scaled-forward log-likelihood of one contig.

    pi: (M,) normalized; T: (M, M); E: (n_keys, M); spans/keys: (L,) with
    L % chunk == 0; span == 0 rows are padding.  Matches the reference's
    forward pass hmm.cpp:45-96 (modulo its 1e-10 alpha floor, which our
    rescaling makes unnecessary).
    """
    L = spans.shape[0]
    n_chunks = L // chunk
    spans_c = spans.reshape(n_chunks, chunk)
    keys_c = keys.reshape(n_chunks, chunk)
    Ms, logs = jax.vmap(lambda s, k: _chunk_product(T, E, s, k, nbits))(
        spans_c, keys_c
    )

    def step(carry, x):
        alpha, ll = carry
        Mc, lg = x
        v = Mc @ alpha
        c = jnp.sum(v)
        return (v / c, ll + (jnp.log(c) + lg).astype(jnp.float64)), None

    init = (pi.astype(T.dtype), jnp.zeros((), jnp.float64))
    (alpha, ll), _ = jax.lax.scan(step, init, (Ms, logs))
    return ll


def estep(pi, T, E, spans, keys, nbits, chunk):
    """E-step over a batch of contigs: log-likelihood + sufficient statistics.

    spans, keys: (C, L) padded with span == 0 rows.
    Returns (ll, gamma0 (M,), xisum (M, M), gamma_sums (n_keys, M)) where the
    statistics are summed over contigs (the only form the M-step needs;
    reference: HMM::Q, hmm.cpp:155-193).
    """

    def total_ll(pi, T, E):
        lls = jax.vmap(
            lambda s, k: forward_loglik(pi, T, E, s, k, nbits, chunk)
        )(spans, keys)
        return jnp.sum(lls)

    ll, grads = jax.value_and_grad(total_ll, argnums=(0, 1, 2))(pi, T, E)
    gamma0 = pi * grads[0]
    xisum = T * grads[1]
    gamma_sums = E * grads[2]
    return ll, gamma0, xisum, gamma_sums


def loglik(pi, T, E, spans, keys, nbits, chunk):
    "Total log-likelihood over a batch of contigs (no gradients)."
    lls = jax.vmap(lambda s, k: forward_loglik(pi, T, E, s, k, nbits, chunk))(
        spans, keys
    )
    return jnp.sum(lls)


def posterior_gammas(pi, T, E, spans, keys, nbits, chunk):
    """Per-row posterior state masses for one contig, summed over each row's
    span: gamma[l, m] = sum over the span of row l of P(state = m | data).

    Obtained as the gradient of logL with respect to a per-row log-scale on
    the emission vector (each position's emission contributes one factor, so
    the derivative counts posterior mass).  Matches the reference's
    save_gamma output up to its per-row normalization (commands/posterior.py
    normalizes columns anyway).
    """
    L = spans.shape[0]
    Mdim = pi.shape[0]

    def ll_fn(logd):
        Escaled = E[keys] * jnp.exp(logd)  # (L, M) per-row emission vectors
        n_chunks = L // chunk
        spans_c = spans.reshape(n_chunks, chunk)
        Ec = Escaled.reshape(n_chunks, chunk, Mdim)

        @partial(jax.checkpoint, static_argnums=(3,))
        def chunk_prod(T, Erows, sp, nbits):
            Tt = T.T
            B = Erows[:, :, None] * Tt[None]
            As, logs = jax.vmap(lambda b, s: _row_operator(b, s, nbits))(B, sp)
            return _tree_reduce(As, logs)

        Ms, logs = jax.vmap(lambda e, s: chunk_prod(T, e, s, nbits))(Ec, spans_c)

        def step(carry, x):
            alpha, ll = carry
            Mc, lg = x
            v = Mc @ alpha
            c = jnp.sum(v)
            return (v / c, ll + (jnp.log(c) + lg).astype(jnp.float64)), None

        init = (pi.astype(T.dtype), jnp.zeros((), jnp.float64))
        (_, ll), _ = jax.lax.scan(step, init, (Ms, logs))
        return ll

    return jax.grad(ll_fn)(jnp.zeros((L, Mdim), dtype=T.dtype))
