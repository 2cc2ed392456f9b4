"""Spike-and-slab meta (multi-cohort) denoiser, fully vectorized.

Replaces the reference's per-marker Python loops (reference
src/sgvamp.py:273,285 call src/sgvamp.py:93-114 once per marker) with a single
vectorized computation over all M markers and L-1 slab components. The
exp-max trick of the reference (src/sgvamp.py:97-101) is kept: all slab
scores are shifted by the per-marker maximum before exponentiation, and the
spike term carries exp(-max). Since slab scores are >= 0, every exponent is
<= 0 and the computation cannot overflow.

Math (identical to reference denoiser_meta, src/sgvamp.py:93-102):

  prior on x_j:   (1-lam) * delta_0 + lam * sum_l omega_l N(0, sigmas_l)
  likelihood:     r1_kj ~ N(x_j, 1/gam1_k) combined with weights a_k

  A        = sum_k a_k gam1_k
  b_j      = sum_k a_k gam1_k r1_kj          (the sufficient statistic)
  s2_l     = 1 / (A + 1/sigmas_l)            (posterior slab variance)
  mu_jl    = b_j * s2_l                      (posterior slab mean)
  score_jl = mu_jl^2 / (2 s2_l) = b_j^2 s2_l / 2
  w_l      = omega_l sqrt(s2_l / sigmas_l)

  xhat_j = lam * sum_l w_l e^{score_jl} mu_jl
           / ((1-lam) + lam * sum_l w_l e^{score_jl})

The derivative w.r.t. cohort k's r1_kj factors as c_k * d xhat_j / d b_j
with c_k = a_k gam1_k (chain rule through b), matching the reference's
hand-derived der_denoiser_meta (src/sgvamp.py:104-114). We return the
b-slope so each cohort's Onsager term alpha1_k = c_k * mean_j(d xhat/d b)
is one multiply (reference computes the full per-marker derivative per rank).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import Array


def combine_cohorts(r1s: Array, gam1s: Array, a: Array) -> Tuple[Array, Array, Array]:
    """Combine per-cohort extrinsic estimates into sufficient statistics.

    Args:
      r1s:   (K, M) per-cohort extrinsic means.
      gam1s: (K,)   per-cohort extrinsic precisions.
      a:     (K,)   cohort weights N_k / sum(N)  (reference src/main.py:287).

    Returns:
      b: (M,) combined statistic sum_k c_k r1_k;  A: scalar sum_k c_k;
      c: (K,) per-cohort coefficients a_k * gam1_k.
    """
    c = a * gam1s
    A = jnp.sum(c)
    b = jnp.einsum("k,km->m", c, r1s)
    return b, A, c


def posterior_mean_and_slope(
    b: Array,
    A: Array,
    lam: Array,
    omegas: Array,
    sigmas: Array,
) -> Tuple[Array, Array]:
    """Posterior mean E[x|b] and its derivative d E[x|b] / d b.

    Args:
      b:      (M,) combined statistic.
      A:      scalar combined precision.
      lam:    scalar slab inclusion probability.
      omegas: (L-1,) slab mixture weights (sum to 1).
      sigmas: (L-1,) slab prior variances (already scaled by Nt).

    Returns:
      (xhat, dxdb), both (M,).
    """
    s2 = 1.0 / (A + 1.0 / sigmas)                    # (L-1,)
    w = omegas * jnp.sqrt(s2 / sigmas)               # (L-1,)
    mu = b[:, None] * s2[None, :]                    # (M, L-1)
    score = 0.5 * (b * b)[:, None] * s2[None, :]     # (M, L-1), >= 0
    m = jnp.max(score, axis=1, keepdims=True)        # (M, 1)
    e = jnp.exp(score - m)                           # (M, L-1), in (0, 1]
    spike = (1.0 - lam) * jnp.exp(-m[:, 0])          # (M,)

    wsum = jnp.einsum("l,ml->m", w, e)               # sum_l w_l e_l
    wmu = jnp.einsum("l,ml->m", w, e * mu)           # sum_l w_l e_l mu_l
    wmu2 = jnp.einsum("l,ml->m", w, e * (mu * mu + s2[None, :]))

    num = lam * wmu
    den = spike + lam * wsum
    xhat = num / den

    # d num / d b = lam * sum_l w_l e_l (mu_l^2 + s2_l)
    # d den / d b = lam * sum_l w_l e_l mu_l = num
    dnum = lam * wmu2
    dxdb = (dnum * den - num * num) / (den * den)
    return xhat, dxdb
