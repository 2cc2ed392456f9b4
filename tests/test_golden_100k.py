"""BASELINE north-star fidelity gate: trajectory parity vs the
reference-semantics oracle on a simulated M=100k banded LD panel
(BASELINE.md: "bit-compatible xhat trajectories vs. reference on simulated
M=100k LD panels", to numerical tolerance).

The oracle runs scipy CSR CG exactly like the reference's sparse path;
the engine runs the block-banded operator with padding masks.
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse

from sgvamp_tpu import PriorState, VampConfig, VampEngine, VampInputs
from sgvamp_tpu.core.operators import BandedLD
from sgvamp_tpu.data.simulate import simulate_ld_band

from oracle import ReferenceOracle


def _band_to_csr(band):
    M, nd = band.shape
    bw = (nd - 1) // 2
    offs = list(range(-bw, bw + 1))
    return scipy.sparse.diags(
        [band[: M - d, bw + d] if d >= 0 else band[-d:, bw + d] for d in offs],
        offs, shape=(M, M), format="csr", dtype=np.float64,
    )


def test_trajectory_parity_m100k():
    rng = np.random.default_rng(0)
    M, N, lam, h2, iters = 100_000, 300_000, 0.01, 0.7, 3
    band, r, x0 = simulate_ld_band(N, M, bandwidth=32, h2=h2, lam=lam,
                                   rng=rng, dtype=np.float64)
    cm = int(M * lam)
    u = (rng.integers(0, 2, size=(iters, 1, M)) * 2 - 1).astype(np.float64)

    R_csr = _band_to_csr(band)
    oracle = ReferenceOracle([R_csr], r[None], np.asarray([1.0]),
                             np.asarray([float(N)]), float(N),
                             prior_vars=[0.0, h2 / cm], prior_probs=[1 - lam, lam])
    ohist = oracle.run(iters, u, cg_maxit=1000, cg_rtol=1e-12, prior_update="em")

    op = BandedLD.from_band(band, block_size=128)
    Mp = op.M
    mask = np.zeros(Mp)
    mask[:M] = 1.0
    rp = np.zeros(Mp)
    rp[:M] = r
    up = np.zeros((iters, 1, Mp))
    up[:, :, :M] = u
    cfg = VampConfig(prior_update="em", dtype="float64", cg_maxit=1000,
                     cg_rtol=1e-12)
    prior = PriorState.create(lam, [1.0], [h2 / cm * N])
    inputs = VampInputs(op=op, r=jnp.asarray(rp)[None], a=jnp.asarray([1.0]),
                        N=jnp.asarray([float(N)]), mask=jnp.asarray(mask))
    hist = VampEngine(inputs, cfg, prior).run(iters, fixed_u=up, M_out=M)

    for it in range(iters):
        o, g = ohist["xhat1"][it], hist["xhat1"][it]
        scale = np.linalg.norm(o)
        np.testing.assert_allclose(g, o, atol=1e-6 * scale,
                                   err_msg=f"xhat1 diverged at iteration {it}")
        np.testing.assert_allclose(np.asarray(hist["params"][it]),
                                   np.asarray(ohist["params"][it]), rtol=1e-6)
