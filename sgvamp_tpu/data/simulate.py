"""Simulators: behavioral ports of the reference's three data generators.

Each reproduces the corresponding reference script's *distributional
behavior* (documented quirks and all, SURVEY quirks ledger #8), with an
explicit numpy Generator instead of global RNG state:

  simulate_single     ~ simulation/sim_gen_phen.py:28-55
      beta var 1/cm, noise sd sqrt(1/h2 - 1), y standardized, saves R.
  simulate_multi      ~ simulation/sim_gen_phen_mult.py:28-61
      shared beta var h2/cm, per-cohort X, noise sd sqrt(1 - h2),
      y NOT standardized (reference leaves :51 commented out), per-cohort R.
  simulate_from_bed   ~ simulation/sim_phen.py:29-63
      phenotype over real PLINK .bed genotypes (bed_reader gated),
      beta var h2/cm, noise sd sqrt(1 - h2), r only (no R).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class SimData:
    y: np.ndarray              # (N,) or per-cohort list
    beta: np.ndarray           # (M,)
    r: np.ndarray              # (M,)
    R: Optional[np.ndarray]    # (M, M) or None


def _standardize_genotypes(X: np.ndarray) -> np.ndarray:
    return (X - X.mean(axis=0)) / X.std(axis=0)


def _sparse_beta(rng: np.random.Generator, M: int, lam: float, var: float) -> np.ndarray:
    cm = int(M * lam)
    beta = np.zeros(M)
    idx = rng.choice(M, size=cm, replace=False)
    beta[idx] = rng.normal(0.0, np.sqrt(var), size=cm)
    return beta


def simulate_single(
    N: int, M: int, h2: float = 0.8, lam: float = 0.5,
    rng: Optional[np.random.Generator] = None,
) -> SimData:
    """Single-cohort generator (reference sim_gen_phen.py behavior)."""
    rng = rng or np.random.default_rng()
    X = rng.binomial(2, 0.4, size=(N, M)).astype(np.float64)
    X = _standardize_genotypes(X)
    beta = _sparse_beta(rng, M, lam, var=1.0 / int(M * lam))
    g = X @ beta
    w = rng.normal(0.0, np.sqrt(1.0 / h2 - 1.0), size=N)
    y = g + w
    y = (y - y.mean()) / y.std()
    X /= np.sqrt(N)
    return SimData(y=y, beta=beta, r=X.T @ y, R=X.T @ X)


def simulate_multi(
    N: int, M: int, K: int = 2, h2: float = 0.8, lam: float = 0.5,
    rng: Optional[np.random.Generator] = None,
) -> List[SimData]:
    """Multi-cohort generator (reference sim_gen_phen_mult.py behavior):
    one shared beta, fresh genotypes per cohort, unstandardized y."""
    rng = rng or np.random.default_rng()
    beta = _sparse_beta(rng, M, lam, var=h2 / int(M * lam))
    out = []
    for _ in range(K):
        X = rng.binomial(2, 0.4, size=(N, M)).astype(np.float64)
        X = _standardize_genotypes(X)
        y = X @ beta + rng.normal(0.0, np.sqrt(1.0 - h2), size=N)
        X /= np.sqrt(N)
        out.append(SimData(y=y, beta=beta, r=X.T @ y, R=X.T @ X))
    return out


def simulate_from_bed(
    bed_path: str, M: int, h2: float = 0.8, lam: float = 0.5,
    rng: Optional[np.random.Generator] = None,
) -> SimData:
    """Phenotype simulation over real genotypes (reference sim_phen.py).

    Requires the optional bed_reader dependency (reference
    simulation/sim_phen.py:5); raises ImportError with guidance if absent.
    """
    try:
        from bed_reader import open_bed
    except ImportError as e:  # pragma: no cover - dependency-gated
        raise ImportError(
            "simulate_from_bed requires the optional 'bed_reader' package"
        ) from e
    rng = rng or np.random.default_rng()
    X = open_bed(bed_path).read()
    N = X.shape[0]
    X = _standardize_genotypes(X)
    beta = _sparse_beta(rng, M, lam, var=h2 / int(M * lam))
    y = X @ beta + rng.normal(0.0, np.sqrt(1.0 - h2), size=N)
    X /= np.sqrt(N)
    return SimData(y=y, beta=beta, r=X.T @ y, R=None)


def simulate_banded(
    N: int, M: int, bandwidth: int, h2: float = 0.8, lam: float = 0.1,
    K: int = 1, rng: Optional[np.random.Generator] = None,
    dtype=np.float32,
):
    """Synthetic *banded* LD panel for large-M benchmarking.

    Builds R directly as a banded SPD correlation-like matrix (AR-style
    decay within the band) without materializing genotypes, plus a
    consistent r = R beta + noise/sqrt(N). This is the scale regime the
    reference cannot reach (it replicates dense/CSR R per rank,
    src/main.py:257); used by bench.py and the sharded tests.
    """
    rng = rng or np.random.default_rng()
    beta = _sparse_beta(rng, M, lam, var=h2 / max(int(M * lam), 1))
    offs = np.arange(1, bandwidth + 1)
    decay = 0.9 ** offs * 0.5
    Rs, rs = [], []
    for _ in range(K):
        R = np.zeros((M, M), dtype=dtype)
        np.fill_diagonal(R, 1.0)
        for o, d in zip(offs, decay):
            band = (d * rng.uniform(0.5, 1.0, M - o)).astype(dtype)
            R[np.arange(M - o), np.arange(o, M)] = band
            R[np.arange(o, M), np.arange(M - o)] = band
        # Diagonal dominance keeps it SPD.
        row_off = np.abs(R).sum(axis=1) - 1.0
        np.fill_diagonal(R, 1.0 + row_off)
        r = R @ beta.astype(dtype) + rng.normal(0, 1.0 / np.sqrt(N), M).astype(dtype)
        Rs.append(R)
        rs.append(r)
    return np.stack(Rs), np.stack(rs), beta
