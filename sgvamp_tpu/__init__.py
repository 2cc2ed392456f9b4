"""sgvamp_tpu: a TPU-native gVAMP engine for GWAS summary statistics.

A from-scratch JAX/XLA rebuild of the capabilities of
medical-genomics-group/sgVAMP-py (reference mounted at /root/reference):
spike-and-slab mixture denoising + conjugate-gradient LMMSE over the MxM LD
matrix, with Onsager corrections, damping, Hutchinson trace estimation,
noise-precision learning and EM/MLE prior learning across K cohorts.

Design (see SURVEY.md section 7): the entire VAMP iteration is one pure,
jit-compiled function over a named-axis device mesh ("cohort", "shard");
the LD matrix is block-sharded so each CG matvec is a local block matmul
followed by a psum over ICI, and the K-cohort axis maps data-parallel.
Hosts only do I/O.
"""

from sgvamp_tpu.config import PriorConfig, VampConfig
from sgvamp_tpu.core.cg import cg_batched
from sgvamp_tpu.core.denoiser import combine_cohorts, posterior_mean_and_slope
from sgvamp_tpu.core.operators import BandedLD, DenseLD
from sgvamp_tpu.core.prior import PriorState, em_loop, em_update, mle_update
from sgvamp_tpu.core.vamp import (StopMonitor, VampEngine, VampInputs,
                                  VampState, vamp_step)

__version__ = "0.1.0"

__all__ = [
    "PriorConfig",
    "VampConfig",
    "cg_batched",
    "combine_cohorts",
    "posterior_mean_and_slope",
    "DenseLD",
    "BandedLD",
    "PriorState",
    "em_update",
    "em_loop",
    "mle_update",
    "StopMonitor",
    "VampEngine",
    "VampInputs",
    "VampState",
    "vamp_step",
]
