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

    def __post_init__(self) -> None:
        if self.prior_update not in (None, "em", "mle"):
            raise ValueError(f"unknown prior_update: {self.prior_update!r}")
        if self.dtype not in ("float32", "float64", "bfloat16"):
            raise ValueError(f"unsupported dtype: {self.dtype!r}")

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)
