"""Precision studies and failure-detection tests.

f32 is the production TPU dtype; these tests document how closely f32
trajectories track f64 on a well-posed problem (the fidelity claim the
README makes) and that the non-finite abort guard fires.
"""

import jax.numpy as jnp
import numpy as np

from sgvamp_tpu import PriorState, VampConfig, VampEngine, VampInputs
from sgvamp_tpu.core.operators import BandedLD, DenseLD
from sgvamp_tpu.data.simulate import simulate_ld_band, simulate_single


def test_f32_tracks_f64_trajectory():
    rng = np.random.default_rng(0)
    N, M, lam, h2, iters = 30000, 1024, 0.05, 0.7, 5
    band, r, x0 = simulate_ld_band(N, M, bandwidth=64, rng=rng,
                                   dtype=np.float64, h2=h2, lam=lam)
    u = (rng.integers(0, 2, size=(iters, 1, M)) * 2 - 1).astype(np.float64)
    hists = {}
    for dt in ["float64", "float32"]:
        op = BandedLD.from_band(band.astype(dt), block_size=128)
        cfg = VampConfig(prior_update="em", dtype=dt, cg_maxit=400,
                         cg_rtol=1e-6, lmmse_damp=True)
        prior = PriorState.create(lam, [1.0], [h2 / int(M * lam) * N])
        inputs = VampInputs(op=op, r=jnp.asarray(r, dt)[None],
                            a=jnp.asarray([1.0], dt),
                            N=jnp.asarray([float(N)], dt))
        hists[dt] = VampEngine(inputs, cfg, prior).run(iters, fixed_u=u)
    for it in range(iters):
        a = hists["float64"]["xhat1"][it]
        b = hists["float32"]["xhat1"][it]
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30)
        # f32 CG at rtol 1e-6 keeps trajectories within ~1e-3 relative
        # over the first VAMP iterations on a well-conditioned panel.
        assert rel < 5e-3, f"f32 diverged at it={it}: rel={rel}"


def test_nonfinite_abort_guard():
    """Poisoned input (NaN in r) must stop the run at iteration 0 instead
    of writing NaN outputs to completion like the reference would."""
    d = simulate_single(800, 64, h2=0.8, lam=0.1, rng=np.random.default_rng(1))
    r = d.r.copy()
    r[3] = np.nan
    prior = PriorState.create(0.1, [1.0], [0.01 * 800])
    inputs = VampInputs(op=DenseLD(mats=jnp.asarray(d.R)[None], s=0.1),
                        r=jnp.asarray(r)[None], a=jnp.asarray([1.0]),
                        N=jnp.asarray([800.0]))
    eng = VampEngine(inputs, VampConfig(dtype="float64"), prior)
    hist = eng.run(5)
    assert hist.get("aborted_at") == 0
    # the poisoned iteration's outputs are NOT recorded/written
    assert len(hist["xhat1"]) == 0
