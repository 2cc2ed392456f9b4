"""Static (trace-time) configuration for the VAMP engine.

These dataclasses are frozen and hashable so they can be closed over by
jit-compiled step functions; changing a field triggers a recompile, which is
the intended semantics (they select program structure, not data).

Flag surface mirrors the reference CLI (reference src/main.py:27-51) but the
values here are the *resolved* semantics, independent of argparse quirks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    """Spike-and-slab Gaussian mixture prior configuration.

    The prior is (1-lam)*delta_0 + lam * sum_l omega_l * N(0, sigma_l^2),
    with L-1 slab components. `vars_` / `probs` are the *unscaled* CLI values
    (reference src/main.py:38-39); the engine scales slab variances by Nt
    (reference src/sgvamp.py:27).
    """

    vars_: Tuple[float, ...] = (0.0, 1.0)
    probs: Tuple[float, ...] = (0.99, 0.01)

    def __post_init__(self) -> None:
        if len(self.vars_) != len(self.probs):
            raise ValueError("prior vars and probs must have equal length L")
        if len(self.vars_) < 2:
            raise ValueError("need at least one slab component (L >= 2)")

    @property
    def L(self) -> int:
        return len(self.probs)

    def init_lam(self) -> float:
        # reference src/sgvamp.py:26
        return 1.0 - self.probs[0]

    def init_omegas(self) -> Tuple[float, ...]:
        # reference src/sgvamp.py:28
        slab = self.probs[1:]
        tot = sum(slab)
        return tuple(p / tot for p in slab)

    def scaled_sigmas(self, Nt: float) -> Tuple[float, ...]:
        # reference src/sgvamp.py:27 - slab variances scaled by total N
        return tuple(v * Nt for v in self.vars_[1:])


@dataclasses.dataclass(frozen=True)
class VampConfig:
    """Static configuration of the VAMP iteration.

    Field semantics follow reference `VAMP.infer` arguments
    (reference src/sgvamp.py:196) and CLI defaults (src/main.py:27-51).
    """

    rho: float = 0.5                      # damping factor
    # Optional damping schedule (beyond the reference's fixed rho): anneal
    # linearly from rho to rho_final over rho_anneal_iters iterations.
    rho_final: Optional[float] = None
    rho_anneal_iters: int = 0
    cg_maxit: int = 500                   # max CG iterations per solve
    cg_rtol: float = 1e-5                 # scipy.sparse.linalg.cg default rtol
    cg_atol: float = 0.0                  # scipy.sparse.linalg.cg default atol
    cg_force_maxiter: bool = False        # exactly cg_maxit iterations (benchmarking)
    # Block-Jacobi preconditioning of the CG solves (core/precond.py):
    # 0 disables; otherwise the P x P diagonal-sub-block size (must divide
    # the operator's storage block). Cuts CG iterations ~2x on banded LD
    # at cg_rtol=1e-5 - a capability the reference's plain scipy cg lacks
    # (reference src/sgvamp.py:316,332).
    cg_precond_block: int = 0
    cg_precond_dtype: str = "float32"     # inverse-block storage (bfloat16 halves apply traffic)
    # Cache a one-time eigendecomposition of the diagonal sub-blocks at
    # engine setup so each iteration's shifted inverse is two batched
    # matmuls instead of a batched LU (2.7 s -> 47 ms per iteration at
    # K=8 x M=1M; the eigh costs ~21 s once, amortized over the run).
    # False rebuilds by direct inversion inside every step.
    cg_precond_eig: bool = True
    learn_gamw: bool = True               # learn noise precision
    lmmse_damp: bool = True               # damp xhat2 / alpha2
    prior_update: Optional[str] = "em"    # "em" | "mle" | None
    update_prior_from: int = 1            # first iteration (0-based) with prior update
    em_prior_maxit: int = 100             # max EM sweeps per iteration
    em_rel_tol: float = 1e-6              # EM convergence (reference sgvamp.py:256)
    mle_maxit: int = 200                  # Newton iterations for the MLE KKT solve
    mle_tol: float = 1e-10                # residual tolerance for MLE convergence
    dtype: str = "float64"                # compute dtype: "float32" | "float64"
    # When True, apply the alpha1 clip that the reference *intended*
    # (reference sgvamp.py:293 discards np.clip's result - a no-op bug; see
    # SURVEY.md quirks ledger #1). Default False replicates the reference.
    clip_alpha1: bool = False
    # When True, clip alpha2 into [1e-5, 1-1e-5] after damping. For an SPD
    # operator, alpha2 = gam2*tr(A^-1)/M with A = gamw*R + gam2*I satisfies
    # 0 < alpha2 < 1 *identically* (each eigenvalue term gam2/(gamw*l+gam2)
    # is in (0,1)), so any excursion outside is Hutchinson/CG/rounding
    # estimator noise; clipping projects the estimate back into its
    # provably-feasible region. Without it the recursion gam1 =
    # gam2*(1-alpha2)/alpha2 goes NEGATIVE once gam2 grows so large that
    # (1-alpha2) ~ gamw*mean_eig/gam2 sinks below the estimator noise floor
    # - which the reference hits too (its f64 scipy path NaNs the same way
    # on near-noiseless panels; it has no guard, sgvamp.py:340-347).
    # Default False replicates the reference.
    clip_alpha2: bool = False
    # > 0 clamps the extrinsic precisions gam1/gam2 into
    # [1/gam_clamp, gam_clamp] (the standard VAMP gamma_min/gamma_max
    # guard, e.g. Rangan et al. 2019). Once the iteration converges past
    # the data's information content, gam2 = gam1*(1-alpha1)/alpha1 grows
    # geometrically (x1e5/iteration at the alpha1 clip) and overflows
    # f32 within ~7 iterations - alpha clips alone only delay that.
    # NOTE: the clamp (with both alpha clips) extends the finite horizon
    # (measured: non-finite at it=14 vs it=10 on a degenerate
    # replicated-cohort panel) but does NOT make post-convergence
    # iterates meaningful - the r1/r2 recursion still amplifies through
    # the clipped (1-alpha) divisors. gVAMP is an early-stopped
    # algorithm; the engine's non-finite abort preserves outputs either
    # way. 0.0 (default) replicates the reference (no guard,
    # sgvamp.py:305,347).
    gam_clamp: float = 0.0

    def __post_init__(self) -> None:
        if self.prior_update not in (None, "em", "mle"):
            raise ValueError(f"unknown prior_update: {self.prior_update!r}")
        if self.dtype not in ("float32", "float64", "bfloat16"):
            raise ValueError(f"unsupported dtype: {self.dtype!r}")

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)
