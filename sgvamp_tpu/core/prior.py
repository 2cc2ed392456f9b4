"""Prior learning: EM and MLE updates of the spike-and-slab mixture weights.

Pure-JAX replacements for the reference's numpy EM sweep (reference
src/sgvamp.py:116-136, driver loop :250-259) and its scipy.optimize.fsolve
MLE KKT solve (reference src/sgvamp.py:139-194). The EM convergence loop is
a lax.while_loop; the MLE solve is a damped Newton iteration on the same
KKT residual, with the reference's reject-and-skip failure semantics
(fsolve ier != 1 or any non-positive weight => no update, :182-189).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PriorState:
    """Learnable prior parameters (a pytree carried in VampState).

    lam:    scalar slab inclusion probability.
    omegas: (L-1,) slab mixture weights (sum to 1).
    sigmas: (L-1,) slab variances, already scaled by Nt
            (reference src/sgvamp.py:27). Treated as data but never updated.
    mle_gam: cached Lagrange multiplier warm start for the MLE solve
            (reference caches it on self.gam, src/sgvamp.py:175-178,194).
    mle_gam_valid: whether mle_gam holds a previous solution.
    mle_last_ok: whether the most recent MLE update was accepted (False
            right after a reject-and-skip; used for host-side logging of
            the reference's "No prior update!" warnings, sgvamp.py:182-189).
    """

    lam: Array
    omegas: Array
    sigmas: Array
    mle_gam: Array
    mle_gam_valid: Array
    mle_last_ok: Array

    @staticmethod
    def create(lam: float, omegas, sigmas, dtype=None) -> "PriorState":
        # Default to the widest enabled float (f64 under x64, else f32);
        # the engine re-casts to its configured dtype at init_state.
        dtype = jax.dtypes.canonicalize_dtype(dtype or jnp.float64)
        return PriorState(
            lam=jnp.asarray(lam, dtype),
            omegas=jnp.asarray(omegas, dtype),
            sigmas=jnp.asarray(sigmas, dtype),
            mle_gam=jnp.asarray(1.0, dtype),
            mle_gam_valid=jnp.asarray(False),
            mle_last_ok=jnp.asarray(True),
        )


# ---------------------------------------------------------------------------
# EM update (reference src/sgvamp.py:116-136)
# ---------------------------------------------------------------------------

def em_update(
    r1s: Array, gam1s: Array, a: Array, lam: Array, omegas: Array,
    sigmas: Array, mask: Array | None = None
) -> Tuple[Array, Array]:
    """One EM sweep over the (K, M, L-1) responsibility tensor.

    Returns updated (lam, omegas). Matches reference prior_update_em
    element-for-element: responsibilities xi with the exp-max shift,
    inclusion posteriors pi, then
      lam    <- mean_j( sum_k a_k pi_kj / sum_k a_k )
      omegas <- sum_kj a_k pi xi_tilde / sum_kj a_k pi .
    `mask` (M,) excludes padded markers from both reductions.
    """
    r2 = (r1s * r1s)[:, :, None]                       # (K, M, 1)
    v = sigmas[None, None, :] + (1.0 / gam1s)[:, None, None]  # (K, 1->M, L-1)
    E = -r2 / (2.0 * v)                                # (K, M, L-1)
    m = jnp.max(E, axis=2, keepdims=True)              # (K, M, 1)
    xi = lam * omegas[None, None, :] * jnp.exp(E - m) / jnp.sqrt(v)
    sxi = jnp.sum(xi, axis=2, keepdims=True)           # (K, M, 1)
    xi_tilde = xi / sxi
    spike = (
        (1.0 - lam)
        * jnp.exp(-r2 * gam1s[:, None, None] / 2.0 - m)
        * jnp.sqrt(gam1s)[:, None, None]
    )
    pi = 1.0 / (1.0 + spike / sxi)                     # (K, M, 1)
    if mask is not None:
        pi = pi * mask[None, :, None]
        M_active = jnp.sum(mask)
    else:
        M_active = r1s.shape[1]

    asum = jnp.sum(a)
    new_lam = jnp.sum(jnp.einsum("k,kmo->mo", a, pi) / asum) / M_active
    num = jnp.einsum("k,kml->l", a, pi[:, :, 0:1] * xi_tilde)
    den = jnp.einsum("k,kmo->", a, pi)
    new_omegas = num / den
    return new_lam, new_omegas


class _EMLoopState(NamedTuple):
    lam: Array
    omegas: Array
    lam_err: Array
    omega_err: Array
    it: Array
    done: Array


def em_loop(
    r1s: Array,
    gam1s: Array,
    a: Array,
    lam: Array,
    omegas: Array,
    sigmas: Array,
    maxit: int,
    rel_tol: float = 1e-6,
    mask: Array | None = None,
) -> Tuple[Array, Array, Array, Array]:
    """Run EM sweeps to convergence (reference driver loop src/sgvamp.py:250-259).

    The reference breaks after an update whose relative change in both lam
    and omegas is < rel_tol, or after maxit sweeps.

    Returns (lam, omegas, sweeps_performed, final_rel_err).
    """

    def cond(s: _EMLoopState) -> Array:
        return (s.it < maxit) & jnp.logical_not(s.done)

    def body(s: _EMLoopState) -> _EMLoopState:
        new_lam, new_omegas = em_update(r1s, gam1s, a, s.lam, s.omegas,
                                        sigmas, mask=mask)
        omega_err = jnp.linalg.norm(new_omegas - s.omegas) / jnp.linalg.norm(s.omegas)
        lam_err = jnp.abs(new_lam - s.lam) / new_lam  # reference divides by self.lam *after* update (:255)
        done = (omega_err < rel_tol) & (lam_err < rel_tol)
        return _EMLoopState(new_lam, new_omegas, lam_err, omega_err, s.it + 1, done)

    init = _EMLoopState(
        lam=lam,
        omegas=omegas,
        lam_err=jnp.asarray(jnp.inf, lam.dtype),
        omega_err=jnp.asarray(jnp.inf, lam.dtype),
        it=jnp.zeros((), jnp.int32),
        done=jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.lam, out.omegas, out.it, jnp.maximum(out.lam_err, out.omega_err)


# ---------------------------------------------------------------------------
# MLE update (reference src/sgvamp.py:139-194)
# ---------------------------------------------------------------------------

def _kkt_residual(x: Array, log_probs_shifted: Array, a: Array, omega0: Array,
                  mask: Array | None = None) -> Array:
    """KKT residual of the penalized mixture-weight MLE.

    x = (omega_1..omega_L, gam). Matches reference Lagrangian_der
    (src/sgvamp.py:139-160) with `probs` precomputed: probs does not depend
    on x, only the omega-weighted denominator does.

      y[:L] = sum_{k,m} a_k probs_kml / (sum_l probs_kml omega_l)
              + (omega0 - 1)/omega + gam
      y[L]  = sum(omega) - 1
    """
    L = omega0.shape[0]
    omega = x[:L]
    gam = x[L]
    probs = jnp.exp(log_probs_shifted)                          # (K, M, L)
    den = jnp.einsum("kml,l->km", probs, omega)                 # (K, M)
    w = 1.0 / den
    if mask is not None:
        w = w * mask[None, :]
    grad = jnp.einsum("k,kml,km->l", a, probs, w)
    y_omega = grad + (omega0 - 1.0) / omega + gam
    y_gam = jnp.sum(omega) - 1.0
    return jnp.concatenate([y_omega, y_gam[None]])


def _kkt_residual_and_jac(
    x: Array, log_probs_shifted: Array, a: Array, omega0: Array,
    mask: Array | None = None
) -> Tuple[Array, Array]:
    """Residual AND closed-form Jacobian of the KKT system, in one pass.

    The residual is an explicit sum over the (K, M, L) probability tensor,
    so its Jacobian is one more einsum over the same tensor:

      d y_l / d omega_j = - sum_km a_k P_kml P_kmj / den_km^2
                          - delta_lj (omega0_l - 1) / omega_l^2
      d y_l / d gam     = 1;   d y_gam / d omega_j = 1;  d y_gam/d gam = 0.

    One evaluation costs ~2 passes over (K, M, L) — vs jax.jacfwd's L+1
    re-evaluations of the residual per Newton step, which dominates step
    time at biobank M (the Newton solve itself is (L+1)x(L+1), trivial).
    """
    L = omega0.shape[0]
    omega = x[:L]
    gam = x[L]
    probs = jnp.exp(log_probs_shifted)                          # (K, M, L)
    den = jnp.einsum("kml,l->km", probs, omega)                 # (K, M)
    w = 1.0 / den
    if mask is not None:
        w = w * mask[None, :]                                   # mask^2==mask
    grad = jnp.einsum("k,kml,km->l", a, probs, w)
    y_omega = grad + (omega0 - 1.0) / omega + gam
    y_gam = jnp.sum(omega) - 1.0
    y = jnp.concatenate([y_omega, y_gam[None]])

    G = jnp.einsum("k,kml,kmj,km->lj", a, probs, probs, w * w)  # (L, L)
    J_oo = -G - jnp.diag((omega0 - 1.0) / (omega * omega))
    ones = jnp.ones((L, 1), x.dtype)
    J = jnp.block([[J_oo, ones], [ones.T, jnp.zeros((1, 1), x.dtype)]])
    return y, J


class _NewtonState(NamedTuple):
    x: Array
    resid: Array
    mu: Array      # Levenberg-Marquardt damping parameter
    it: Array
    done: Array
    failed: Array


def mle_update(
    r1s: Array,
    gam1s: Array,
    a: Array,
    prior: PriorState,
    maxit: int = 200,
    tol: float = 1e-10,
    mask: Array | None = None,
) -> PriorState:
    """MLE prior update with fsolve-equivalent semantics.

    Solves the (L+1)-dimensional KKT system by Levenberg-Marquardt damped
    Newton, warm-started at the current prior (and cached multiplier),
    then applies the reference's guards: no update if the solve did not
    converge or any weight is non-positive (reference src/sgvamp.py:
    182-189); otherwise weights are renormalized and lam/omegas/gam
    refreshed (:190-194).

    The LM damping is the robustness analogue of MINPACK hybrd's trust
    region (the engine behind the reference's fsolve, src/sgvamp.py:180):
    on a (near-)singular Jacobian - nearly-degenerate mixture components,
    extreme gam1 spreads - the normal-equations system
    (J^T J + mu*diag(J^T J)) dx = J^T y stays solvable, where a plain
    Newton solve would produce NaN and force a skipped update even on
    problems hybrd converges on. mu shrinks toward Newton (quadratic
    convergence) on accepted steps and grows on rejected ones.
    """
    dtype = prior.lam.dtype
    Lm1 = prior.sigmas.shape[0]
    L = Lm1 + 1

    omega0 = jnp.concatenate([(1.0 - prior.lam)[None], prior.lam * prior.omegas])
    sigma2 = jnp.concatenate([jnp.asarray([1e-16], dtype), prior.sigmas])  # spike var (reference :170)

    # Precompute log-probabilities with the reference's *global* exp-max
    # shift (src/sgvamp.py:153: a single scalar max over (K, M, L)).
    v = sigma2[None, None, :] + (1.0 / gam1s)[:, None, None]     # (K, 1, L) -> (K, M, L)
    E = -(r1s * r1s)[:, :, None] / (2.0 * v)
    m = jnp.max(E)
    log_probs = E - m - 0.5 * jnp.log(v)

    gam_init = jnp.where(prior.mle_gam_valid, prior.mle_gam, jnp.asarray(1.0, dtype))
    x0 = jnp.concatenate([omega0, gam_init[None]])

    # The KKT residual's gradient term sums over all (K, M) markers, so
    # its natural magnitude is O(M_active); convergence/acceptance
    # thresholds must scale with it or large-M f32 runs can NEVER accept
    # (measured at M=512k: absolute 1e-6 demands ~1e-11 relative accuracy
    # and every update was rejected "fsolve-failed"). The reference never
    # hits this because MINPACK hybrd converges on relative step size,
    # not residual magnitude (its xtol semantics, mirrored by step_small
    # below).
    if mask is not None:
        resid_scale = jnp.maximum(jnp.sum(mask), 1.0)
    else:
        resid_scale = jnp.asarray(float(r1s.shape[1]), dtype)

    resid_fn = lambda x: _kkt_residual(x, log_probs, a, omega0, mask)
    resid_jac_fn = lambda x: _kkt_residual_and_jac(x, log_probs, a, omega0,
                                                   mask)

    MU_MIN, MU_MAX = 1e-12, 1e8

    def cond(s: _NewtonState) -> Array:
        return (s.it < maxit) & jnp.logical_not(s.done | s.failed)

    MU_NEWTON = 1e-6  # at or below this damping, take plain Newton steps

    def body(s: _NewtonState) -> _NewtonState:
        y, J = resid_jac_fn(s.x)
        # Plain Newton step (non-monotone, like MINPACK far from trouble).
        newton_step = jnp.linalg.solve(J, y)
        # Levenberg-Marquardt fallback on the normal equations; Marquardt's
        # diagonal scaling keeps the damping dimensionally consistent
        # across the very different magnitudes of omega vs gam. Solvable
        # even when J itself is singular (degenerate mixture components).
        JTJ = J.T @ J
        g = J.T @ y
        d = jnp.diag(JTJ)
        d = jnp.where(d > 0.0, d, 1.0)
        lm_step = jnp.linalg.solve(JTJ + s.mu * jnp.diag(d), g)
        use_newton = jnp.all(jnp.isfinite(newton_step)) & (s.mu <= MU_NEWTON)
        step = jnp.where(use_newton, newton_step, lm_step)
        # Positivity backtracking: keep omegas strictly positive along the
        # path so the 1/omega terms stay finite.
        x_new = s.x - step

        def backtrack(carry):
            t, xn = carry
            t = t * 0.5
            return t, s.x - t * step

        def bt_cond(carry):
            t, xn = carry
            return jnp.any(xn[:L] <= 0.0) & (t > 1e-6)

        t, x_new = jax.lax.while_loop(bt_cond, backtrack,
                                      (jnp.asarray(1.0, dtype), x_new))
        new_resid = jnp.linalg.norm(resid_fn(x_new))
        bad = jnp.logical_not(jnp.all(jnp.isfinite(x_new))) | jnp.logical_not(
            jnp.isfinite(new_resid)
        )
        # Newton steps are accepted whenever finite (non-monotone descent,
        # matching hybrd's ability to traverse residual increases); LM
        # steps must decrease the residual or the damping is raised and
        # the iterate stays put.
        accept = jnp.logical_not(bad) & (use_newton | (new_resid < s.resid))
        x_next = jnp.where(accept, x_new, s.x)
        resid_next = jnp.where(accept, new_resid, s.resid)
        mu_next = jnp.clip(jnp.where(accept, s.mu * 0.3, s.mu * 10.0),
                           MU_MIN, MU_MAX * 10.0)
        failed = mu_next > MU_MAX  # no productive step at any damping
        # A tiny accepted step signals convergence (fsolve's xtol
        # semantics) - but only in the (near-)Newton regime; under heavy
        # LM damping steps are short by construction.
        step_small = accept & (s.mu <= 1e-4) & (
            jnp.linalg.norm(t * step) < 1.49012e-8 * (1.0 + jnp.linalg.norm(s.x))
        )
        done = (resid_next < tol * resid_scale) | step_small
        return _NewtonState(x=x_next, resid=resid_next, mu=mu_next,
                            it=s.it + 1, done=done, failed=failed)

    init = _NewtonState(
        x=x0,
        resid=jnp.linalg.norm(resid_fn(x0)),
        mu=jnp.asarray(MU_NEWTON, dtype),
        it=jnp.zeros((), jnp.int32),
        done=jnp.asarray(False),
        failed=jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, body, init)

    x = out.x
    # Reference guards (src/sgvamp.py:182-189): converged and all weights > 0.
    final_resid = jnp.linalg.norm(resid_fn(x))
    ok = (
        jnp.logical_not(out.failed)
        & (final_resid < 1e-6 * resid_scale)
        & jnp.all(x[:L] > 0.0)
        & jnp.all(jnp.isfinite(x))
    )

    w = x[:L] / jnp.sum(x[:L])
    new_lam = 1.0 - w[0]
    new_omegas = w[1:] / jnp.sum(w[1:])
    new_gam = x[L]

    return PriorState(
        lam=jnp.where(ok, new_lam, prior.lam),
        omegas=jnp.where(ok, new_omegas, prior.omegas),
        sigmas=prior.sigmas,
        mle_gam=jnp.where(ok, new_gam, prior.mle_gam),
        mle_gam_valid=prior.mle_gam_valid | ok,
        mle_last_ok=ok,
    )
