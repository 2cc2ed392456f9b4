"""sgvamp_tpu benchmark: VAMP iterations/sec on a biobank-scale banded LD panel.

Measures the full jit-compiled VAMP iteration (denoiser + EM prior + two
CG solves + Hutchinson + gamw learning) on one TPU chip at M=512k markers,
bandwidth 256, with a fixed CG budget (cg_rtol=0 forces exactly cg_maxit
matvecs per solve) so per-iteration work is deterministic. The headline
iter/s is the MEDIAN over several multi-step timed blocks (per-block
samples are persisted) to guard against the shared chip's load variance.

Roofline methodology (round 3): per-pass matvec time comes from n-vs-2n
chained fori_loop differencing with min-of-reps sampling (the remote
tunnel's ~27 ms dispatch cost and its 100-400 ms spikes cancel/are
rejected); the HBM read ceiling is a DMA-bound pallas probe over the same
block array (ops/membench.py). Both roofline fractions are reported:
vs the 819 GB/s v5e spec and vs the same-run measured ceiling.

Default configuration: the symmetric pallas operator
(SGVAMP_BENCH_OPERATOR/SGVAMP_BENCH_LD_DTYPE/... override for A/B).
bfloat16 block storage is numerically equivalent to the float32 einsum
operator on TPU — the MXU truncates f32 matmul operands to bf16 by
default, and both paths accumulate in f32 (measured: alignment agrees to
6 decimals at M=512k) — while moving ~3x fewer HBM bytes per LD pass
(upper-triangle blocks only, half-width storage); int8 per-block
quantized storage halves the bytes again.

A production-mode solve A/B (solve_rtol1e5) records time-to-tolerance of
plain vs block-Jacobi preconditioned CG on a realistically
ill-conditioned panel (the headline panel is benign; SGVAMP_BENCH_SOLVE=0
skips it).

Baseline: the reference implementation's per-iteration cost on this host's
CPU, assembled from its measured parts (scipy CSR CG matvecs at the same
fixed budget, the per-marker Python denoiser/derivative loops sampled and
scaled to M, and one vectorized EM sweep) - the reference itself
(/root/reference/src/sgvamp.py:273,285,316,332) cannot run M=512k in one
piece, so its cost is measured component-wise on identical data.

Prints ONE JSON line:
  {"metric": "vamp_iters_per_sec_M512k", "value": ..., "unit": "iter/s",
   "vs_baseline": <speedup over reference CPU implementation>, ...extras}
"""

import json
import os
import sys
import time

import numpy as np


def _stage(msg):
    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def build_problem(M, bandwidth, N, lam, h2, seed=0, K=1):
    """K > 1 returns r of shape (K, M): K independent cohorts (shared panel
    + signal, independent noise draws) - a genuine meta-analysis. Identical
    replication instead makes the meta denoiser overconfident by K and the
    EM prior collapses (measured: lam 0.01 -> 0.91 in 3 iterations)."""
    from sgvamp_tpu.data.simulate import simulate_ld_band

    ktag = f"_K{K}" if K > 1 else ""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_problem_M{M}_bw{bandwidth}{ktag}_s{seed}.npz")
    if os.path.exists(cache):
        with np.load(cache) as d:
            return d["band"], d["r"], d["x0"]
    rng = np.random.default_rng(seed)
    band, r, x0 = simulate_ld_band(N, M, bandwidth, h2=h2, lam=lam, rng=rng,
                                   dtype=np.float32, n_r=K)
    try:
        np.savez(cache, band=band, r=r, x0=x0)
    except OSError:
        pass
    return band, r, x0


def _setup_tpu(band, r, N, lam, h2, cg_maxit, block_size):
    import jax
    import jax.numpy as jnp

    from sgvamp_tpu import PriorState, VampConfig, VampInputs
    from sgvamp_tpu.core import vamp as V
    from sgvamp_tpu.core.operators import BandedLD

    M = r.shape[-1]  # r is (M,) or (K, M) independent cohorts
    cm = max(int(M * lam), 1)
    K = int(os.environ.get("SGVAMP_BENCH_K", "1"))
    _stage("packing blocks + device transfer")
    ld_dtype = os.environ.get("SGVAMP_BENCH_LD_DTYPE", _DEFAULT_LD_DTYPE)
    from sgvamp_tpu.ops.band_kernel import SymBandedLD

    want_sym = os.environ.get("SGVAMP_BENCH_OPERATOR", "sym") == "sym"
    # mode=auto keeps x/y VMEM-resident when they fit and switches to the
    # streamed kernel above that, so the sym path has no M ceiling.
    layout = os.environ.get("SGVAMP_BENCH_LAYOUT", "diag")
    # streamed default: measured faster than the VMEM-resident flavor at
    # M=512k (1.19 vs 1.33 ms/pass, same chip+run) and it is the only
    # flavor with no M ceiling.
    mode = os.environ.get("SGVAMP_BENCH_MODE", "streamed")
    if want_sym:
        op = SymBandedLD.from_band(band, block_size=block_size, dtype=ld_dtype,
                                   K=K, layout=layout)
        if mode != "auto":
            import dataclasses as _dc

            op = _dc.replace(op, mode=mode)
        jax.block_until_ready(op.upper)
    else:
        op = BandedLD.from_band(band, block_size=block_size, dtype=ld_dtype,
                                K=K)
        jax.block_until_ready(op.blocks)
    Mp = op.M
    dt = jnp.float32
    mask = np.zeros(Mp, np.float32)
    mask[:M] = 1.0
    rp = np.zeros((K, Mp), np.float32)
    rp[:, :M] = r
    # cg_force_maxiter makes per-iteration work exactly deterministic:
    # cg_maxit fused passes for the two solves + 1 residual + 1 gamw pass.
    cfg = VampConfig(prior_update="em", dtype="float32", cg_maxit=cg_maxit,
                     cg_force_maxiter=True, em_prior_maxit=5, rho=0.5,
                     lmmse_damp=True)
    # K>1 cohorts share the panel and the true signal (independent noise
    # draws, build_problem K=...), so the matched slab variance is the
    # single-cohort signal scale h2/cm*N regardless of K (scaling by N*K
    # mis-specifies the prior K-fold; measured at xl/K=8: align NaNs by
    # iteration 20).
    prior = PriorState.create(lam, [1.0], [h2 / cm * N])
    inputs = VampInputs(op=op, r=jnp.asarray(rp),
                        a=jnp.full((K,), 1.0 / K, dt),
                        N=jnp.full((K,), float(N), dt),
                        mask=jnp.asarray(mask))
    state = V.init_state(inputs, cfg, prior, gamw=5.0, gam1=1e-6)
    return op, inputs, state, cfg


def time_matvec_child(band, r, N, lam, h2, cg_maxit, block_size):
    """Roofline numerator + denominator, both measured credibly.

    Numerator: the per-pass matvec time from lax.fori_loop chains inside
    one jit, differencing an n-pass and a 2n-pass chain - removing
    dispatch and pipeline-fill fixed costs entirely (the round-2 bench
    timed single dispatches over the remote tunnel and absorbed ~1.2 ms of
    fixed overhead per call).

    Denominator: the DMA-bound pallas read probe over the SAME block array
    (sgvamp_tpu.ops.membench) - a genuine HBM read ceiling, unlike the
    VPU-bound jnp reduction the round-2 bench used (which reported a
    "ceiling" 2.35x BELOW the achieved rate).
    """
    import jax
    import jax.numpy as jnp

    op, inputs, state, cfg = _setup_tpu(band, r, N, lam, h2, cg_maxit, block_size)
    import functools

    from sgvamp_tpu.ops.membench import measure_read_gbps

    ub = op.upper if hasattr(op, "upper") else jax.tree_util.tree_leaves(op)[0]
    probe = functools.partial(measure_read_gbps, ub, n=30,
                              interpret=jax.default_backend() != "tpu")

    # Roofline pair consistency: the DMA ceiling probe runs immediately
    # BEFORE and AFTER the matvec chain timing and the larger reading is
    # the ceiling - on a shared chip the two probes bracket whatever load
    # the matvec saw, so ceiling >= matvec holds unless the chip quiesced
    # exactly during the matvec window (round 3 ran the probes minutes
    # apart and recorded matvec 2.8% ABOVE the ceiling).
    _stage("measuring HBM read ceiling (pallas DMA probe, pre)")
    ceil_pre, mr_pre = probe()

    _stage("timing matvec (chained, differenced)")
    # NOTE: on the experimental remote-tunnel backend, block_until_ready
    # can return before execution finishes; a concrete scalar fetch is the
    # only reliable barrier, so every timing below ends in one.
    x = inputs.r.repeat(2, axis=0)

    @jax.jit
    def chain(i, v, n):
        # 0.02 damping keeps the iterate finite over n unnormalized passes.
        # n is a TRACED trip count so the n-pass and 2n-pass chains share
        # ONE compiled program - the remote compile service's latency
        # (minutes per program on a bad day) made the two-static-programs
        # version blow its child budget routinely.
        return jax.lax.fori_loop(0, n, lambda _, v: i.op.matvec(v) * 0.02, v)

    def timed(n, reps=4):
        # min-of-reps first: the remote-tunnel dispatch has a ~27 ms fixed
        # cost with occasional 100-400 ms spikes; a single spiked sample
        # would poison the n-vs-2n difference
        _ = float(chain(inputs, x, n)[0, 0])  # compile + warm
        best = float("inf")
        for i in range(reps):
            t0 = time.time()
            _ = float(chain(inputs, x * (1.0 + 1e-6 * (i + 1)), n)[0, 0])
            best = min(best, time.time() - t0)
        return best

    reps = int(os.environ.get("SGVAMP_BENCH_MV_REPS", "64"))
    t_n, t_2n = timed(reps), timed(2 * reps)
    matvec_s = max((t_2n - t_n) / reps, 1e-12)

    _stage("measuring HBM read ceiling (pallas DMA probe, post)")
    ceil_post, mr_post = probe()
    memread_s = min(mr_pre, mr_post)
    return matvec_s, memread_s, int(op.bytes_per_pass()), ceil_pre, ceil_post


def time_step_child(band, r, N, lam, h2, iters, cg_maxit, block_size, x0=None,
                    repeats=4):
    """Full-step timing (run in a killable subprocess: the step's first
    compile can take minutes on a busy compile service). Returns the step
    result dict.

    Timing structure: the warmup step compiles the program and advances to
    it=1; that state is SNAPSHOTTED and each of `repeats` timed blocks of
    `iters` chained steps restarts from the snapshot (dispatches pipeline
    inside a block; the concrete fetch at block end is the barrier). Every
    block therefore does IDENTICAL work - same EM trip counts, same finite
    state - so per-block samples are directly comparable and the final
    state is finite by construction (rounds 2-3 chained the blocks off the
    end of the quality gate, where configs iterated far past their
    operating point could go non-finite and quietly shrink the
    data-dependent EM work being timed).
    """
    import jax

    from sgvamp_tpu.core import vamp as V

    op, inputs, state, cfg = _setup_tpu(band, r, N, lam, h2, cg_maxit, block_size)
    step = jax.jit(lambda s, i: V.vamp_step(s, i, cfg, None))

    _stage("compiling step")
    t0 = time.time()
    state, aux = step(state, inputs)
    _ = float(aux.gamw[0])
    compile_s = time.time() - t0
    state1 = state  # it=1 snapshot: timing blocks restart here

    def _align(xh):
        xh = np.asarray(xh[: x0.shape[0]], np.float64)
        denom = np.linalg.norm(xh) * np.linalg.norm(x0)
        a = float(xh @ np.asarray(x0, np.float64) / denom) if denom else 0.0
        return a if np.isfinite(a) else -1.0

    # Quality gate at the REFERENCE's default iteration budget
    # (iterations=10, reference src/main.py:37): run 9 more steps (one is
    # the compile warmup above) and record alignment vs the true signal -
    # at it=10, the best over the trajectory (the reference's post-hoc
    # CSV selection, src/sgvamp.py:379-387), AND the iterate the engine's
    # own truth-free StopMonitor selects (core/vamp.py): gVAMP is an
    # early-stopped algorithm, and align_stop is what a production run
    # with --stop-on-divergence actually delivers - the automated version
    # of the post-hoc selection, reported without peeking at x0.
    align, align_best, align_best_it = -1.0, -1.0, -1
    align_stop, stop_it, stop_reason = -1.0, -1, None
    if x0 is not None:
        _stage("quality gate: 10 reference-default iterations + StopMonitor")
        mon = V.StopMonitor(tol=1e-4, gam1_drop=10.0)
        mon.update(1, np.asarray(state.xhat1), np.asarray(aux.gam1))
        align_best, align_best_it = _align(state.xhat1), 1
        for gate_it in range(2, 11):
            state, aux = step(state, inputs)
            a = _align(state.xhat1)
            if a > align_best:
                align_best, align_best_it = a, gate_it
            mon.update(gate_it, np.asarray(state.xhat1), np.asarray(aux.gam1))
        align = _align(state.xhat1)
        stop_it, stop_reason = mon.stopped_at, mon.reason
        if mon.best_xhat1 is not None:
            align_stop = _align(mon.best_xhat1)

    _stage(f"timing {repeats} blocks x {iters} steps (each from the it=1 snapshot)")
    samples = []
    for _ in range(repeats):
        state = state1
        t0 = time.time()
        for _ in range(iters):
            state, aux = step(state, inputs)
        _ = float(aux.gamw[0])  # chain dependency forces all iters
        samples.append((time.time() - t0) / iters)
    finite = bool(jax.numpy.all(jax.numpy.isfinite(state.xhat2)))
    return {"iter_s_samples": samples, "compile_s": compile_s,
            "finite": finite, "align": align, "align_best": align_best,
            "align_best_it": align_best_it, "align_stop": align_stop,
            "stop_it": stop_it, "stop_reason": stop_reason}


def time_solve_child(block_size):
    """Production-mode (rtol=1e-5) CG time-to-tolerance, plain vs
    block-Jacobi preconditioned, on a REALISTICALLY conditioned LD panel
    (simulate_ld_band strength=4: near-singular local correlation, the
    regime the reference's cg_maxit=500 default anticipates). The headline
    panel is too well-conditioned to need many CG iterations; this is the
    time-to-solution story. The reference's scipy cg has no preconditioner
    at all (reference src/sgvamp.py:316,332)."""
    import jax
    import jax.numpy as jnp

    from sgvamp_tpu.core.cg import cg_batched
    from sgvamp_tpu.core.precond import (apply_block_jacobi,
                                         block_jacobi_inverse)
    from sgvamp_tpu.data.simulate import simulate_ld_band
    from sgvamp_tpu.ops.band_kernel import SymBandedLD

    M, bandwidth, _, _, _ = _params()
    ld_dtype = os.environ.get("SGVAMP_BENCH_LD_DTYPE", _DEFAULT_LD_DTYPE)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_problem_hard_M{M}_bw{bandwidth}.npz")
    _stage("building hard problem")
    if os.path.exists(cache):
        with np.load(cache) as d:
            band, r = d["band"], d["r"]
    else:
        rng = np.random.default_rng(0)
        band, r, _ = simulate_ld_band(N_SAMPLES, M, bandwidth, h2=H2, lam=LAM,
                                      rng=rng, dtype=np.float32,
                                      strength=4.0, decay=0.97)
        try:
            np.savez(cache, band=band, r=r)
        except OSError:
            pass
    op = SymBandedLD.from_band(band, block_size=block_size, dtype=ld_dtype)
    jax.block_until_ready(op.upper)
    gamw = jnp.asarray([40.0])
    gam2 = jnp.asarray([1.0])
    rng = np.random.default_rng(1)
    u = (rng.integers(0, 2, size=(1, op.M)) * 2.0 - 1.0).astype(np.float32)
    b = jnp.concatenate([jnp.asarray(r, jnp.float32).reshape(1, -1),
                         jnp.asarray(u)], axis=0)
    gamw2 = jnp.concatenate([gamw, gamw])
    gam22 = jnp.concatenate([gam2, gam2])
    maxit = 400
    pblock = int(os.environ.get("SGVAMP_BENCH_PRECOND_BLOCK", "64"))
    pdtype = os.environ.get("SGVAMP_BENCH_PRECOND_DTYPE", "bfloat16")

    @jax.jit
    def solve_plain(o, bb):
        def mv(v):
            return gamw2[:, None] * o.matvec(v) + gam22[:, None] * v
        res = cg_batched(mv, bb, jnp.zeros_like(bb), maxiter=maxit, rtol=1e-5)
        return res.x, res.iters, res.converged

    @jax.jit
    def solve_pre(o, bb):
        def mv(v):
            return gamw2[:, None] * o.matvec(v) + gam22[:, None] * v
        pinv = block_jacobi_inverse(o, gamw, gam2, pblock,
                                    dtype=jnp.dtype(pdtype))
        res = cg_batched(mv, bb, jnp.zeros_like(bb), maxiter=maxit, rtol=1e-5,
                         precond=lambda v: apply_block_jacobi(pinv, v))
        return res.x, res.iters, res.converged

    out = {"precond_block": pblock, "precond_dtype": pdtype,
           "ld_dtype": ld_dtype}
    _stage("timing plain vs preconditioned solve")
    for name, fn in (("plain", solve_plain), ("precond", solve_pre)):
        xs, iters, conv = fn(op, b)
        _ = float(xs[0, 0])  # compile + warm (fills the CG warm cache too)
        t0 = time.time()
        xs, iters, conv = fn(op, b * (1.0 + 1e-6))
        _ = float(xs[0, 0])
        out[f"{name}_s"] = round(time.time() - t0, 4)
        out[f"{name}_iters"] = int(np.max(np.asarray(iters)))
        out[f"{name}_converged"] = bool(np.all(np.asarray(conv)))
    out["speedup"] = round(out["plain_s"] / max(out["precond_s"], 1e-9), 3)
    return out


def run_child(mode, budget_s, extra_env=None):
    """Run a timing child under a budget; returns its JSON dict or None.
    Device-side work (including the first compile, which can take minutes
    on a busy remote compile service) only ever happens in these killable
    subprocesses, so the bench always reports."""
    import subprocess

    env = dict(os.environ)
    env["SGVAMP_BENCH_CHILD"] = mode
    if extra_env:
        env.update(extra_env)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, timeout=max(60, budget_s), text=True,
        )
    except subprocess.TimeoutExpired:
        _stage(f"{mode}-timing child exceeded budget")
        return None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    _stage(f"{mode}-timing child failed: {out.stderr[-500:]}")
    return None


def baseline_cpu(band, r, N, lam, h2, cg_maxit, sample_markers=2000,
                 measure_M=65536):
    """Reference-equivalent per-iteration cost on CPU (component-wise).

    The scipy CSR matvec is measured on a measure_M-marker slice of the
    same band and scaled linearly to M (CSR matvec cost is linear in nnz
    and memory-bound); the per-marker Python denoiser loops are sampled
    over sample_markers and scaled to M. Both scalings favor the baseline
    (no cache-pressure penalty at full size).
    """
    import scipy.sparse

    M = r.shape[0]
    bw = (band.shape[1] - 1) // 2
    Mb = min(M, measure_M)
    bandb = band[:Mb]
    # CSR assembly from band storage (the reference's storage format,
    # src/main.py:257).
    offs = list(range(-bw, bw + 1))
    R = scipy.sparse.diags(
        [bandb[:Mb - d, bw + d] if d >= 0 else bandb[-d:, bw + d]
         for d in offs],
        offs, shape=(Mb, Mb), format="csr", dtype=np.float64)
    x = np.asarray(r[:Mb], np.float64)

    # (a) CG matvec cost at the same fixed budget: 2 solves x cg_maxit
    # matvecs + 2 extra matvecs for gamw learning (sgvamp.py:352,359).
    reps = 5
    t0 = time.time()
    y = x
    for _ in range(reps):
        y = R @ y
    matvec_s = (time.time() - t0) / reps * (M / Mb)
    n_matvecs = 2 * cg_maxit + 2
    # CG overhead beyond the matvec (axpys/dots) is real but small; ignore
    # it in the baseline's favor.

    # (b) per-marker Python denoiser + derivative loops (sgvamp.py:273,285),
    # sampled and scaled to M.
    sigmas = np.asarray([h2 / max(int(M * lam), 1) * N])
    omegas = np.asarray([1.0])
    a = np.asarray([1.0])
    gam1s = np.asarray([1.0])

    def denoiser_meta(rs, gam1s):
        s2 = 1.0 / (np.sum(a * gam1s) + 1.0 / sigmas)
        mu = np.inner(rs, a * gam1s) * s2
        mi = int(np.argmax(mu * mu / s2))
        E = np.exp(0.5 * (mu * mu * s2[mi] - mu[mi] ** 2 * s2) / (s2 * s2[mi]))
        num = lam * np.sum(omegas * E * mu * np.sqrt(s2 / sigmas))
        E2 = np.exp(-0.5 * mu[mi] ** 2 / s2[mi])
        den = (1 - lam) * E2 + lam * np.sum(omegas * E * np.sqrt(s2 / sigmas))
        return num / den

    sub = x[:sample_markers]
    t0 = time.time()
    _ = [denoiser_meta(np.asarray([v]), gam1s) for v in sub]
    denoise_sample_s = time.time() - t0
    # xhat1 loop + derivative loop are the same cost shape (two M-loops).
    denoise_s = 2.0 * denoise_sample_s * (M / sample_markers)

    # (c) one vectorized EM sweep x em_prior_maxit(=5 as configured on TPU)
    r1s = x.reshape(1, Mb)
    t0 = time.time()
    for _ in range(5):
        v = sigmas.reshape(1, 1, 1) + 1.0
        E = -(r1s ** 2)[:, :, None] / (2 * v)
        m = E.max(axis=2, keepdims=True)
        xi = lam * np.exp(E - m) / np.sqrt(v)
        sxi = xi.sum(axis=2, keepdims=True)
        pi = 1.0 / (1.0 + (1 - lam) * np.exp(-(r1s ** 2)[:, :, None] / 2 - m) / sxi)
    em_s = (time.time() - t0) * (M / Mb)

    per_iter = n_matvecs * matvec_s + denoise_s + em_s
    return per_iter, {"matvec_s": matvec_s, "denoise_s": denoise_s, "em_s": em_s}


def _params():
    size = os.environ.get("SGVAMP_BENCH_SIZE", "large")
    if size == "small":  # quick smoke (CI / CPU)
        B = int(os.environ.get("SGVAMP_BENCH_B", "256"))
        return 16384, 128, B, 20, 3
    if size == "medium":  # quarter-size fresh-certification fallback: same
        # chip, same config knobs, 1/4 the tunnel transfer and a smaller
        # program - used when the full-size children starve on compile-
        # service load so the round still lands a FRESH device measurement
        B = int(os.environ.get("SGVAMP_BENCH_B", "128"))
        return 131072, 256, B, 100, 3
    if size == "xl":  # scale-ceiling demo: combine with SGVAMP_BENCH_K=8
        B = int(os.environ.get("SGVAMP_BENCH_B", "256"))
        return 1048576, 256, B, 100, 3
    # B=128 default: same-chip A/B at int8 measured 24.46 iter/s vs 21.01
    # at B=256 (40.88 vs 47.60 ms median, identical align_stop 0.98703;
    # per-pass 0.328 vs 0.383 ms - BENCH_AB.json). The smaller block
    # halves the zero-padding fraction of the band's edge blocks.
    B = int(os.environ.get("SGVAMP_BENCH_B", "128"))
    return 524288, 256, B, 100, 3


N_SAMPLES, LAM, H2 = 300000, 0.01, 0.7
# TPU v5e HBM bandwidth spec (the BASELINE.md roofline reference point).
HBM_SPEC_GBPS = 819.0
# A/B'd on-chip at M=512k/bw=256 (recorded in BENCH_AB.json): int8
# per-block quantized LD streams 0.383 ms/pass at B=256 (0.328 at B=128)
# vs bfloat16's 0.736, with gate alignment identical to 6 decimals
# (align_stop 0.98703 for bf16/int8/int4 alike). int4 is FASTER still
# (0.288 ms/pass, 26.1 iter/s) but fails the production solve: on the
# strength=4 ill-conditioned panel its 16-level quantization degrades
# conditioning fidelity and rtol=1e-5 CG stalls at maxiter
# (solve_by_dtype), so int8 stays the default and int4 is opt-in for
# screening runs.
_DEFAULT_LD_DTYPE = "int8"


def _enable_compile_cache():
    """Persistent XLA compilation cache: cuts the step's first-compile cost
    (minutes on the remote compile service) to seconds on any rerun with
    unchanged shapes. Must run before the backend initializes."""
    if os.environ.get("SGVAMP_COMPILE_CACHE", "1") != "1":
        return
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (OSError, AttributeError):
        pass


def _apply_platform_override():
    """SGVAMP_BENCH_PLATFORM=cpu forces the child onto CPU (the JAX_PLATFORMS
    env var is swallowed by this environment's site hooks, so jax.config is
    the only reliable switch)."""
    plat = os.environ.get("SGVAMP_BENCH_PLATFORM")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass


def child_main(mode):
    """Subprocess entry: run one timing mode, print one JSON line."""
    _apply_platform_override()
    _enable_compile_cache()
    M, bandwidth, block_size, cg_maxit, iters = _params()
    if mode == "solve":
        result = time_solve_child(block_size)
        try:
            with open(_child_cache_path("solve"), "w") as f:
                json.dump(result, f)
        except OSError:
            pass
        print(json.dumps(result))
        return
    band, r, x0 = build_problem(M, bandwidth, N_SAMPLES, LAM, H2,
                                K=int(os.environ.get("SGVAMP_BENCH_K", "1")))
    if mode == "step":
        result = time_step_child(
            band, r, N_SAMPLES, LAM, H2, iters, cg_maxit, block_size, x0=x0)
        # evidence for the compile_s column: how many programs the
        # persistent XLA cache held when this child compiled (a warm cache
        # turns the minutes-long remote compile into seconds)
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        try:
            result["xla_cache_entries"] = len(os.listdir(cache_dir))
        except OSError:
            result["xla_cache_entries"] = 0
        try:
            with open(_child_cache_path("step"), "w") as f:
                json.dump(result, f)
        except OSError:
            pass
        print(json.dumps(result))
    else:
        matvec_s, memread_s, bpp, ceil_pre, ceil_post = time_matvec_child(
            band, r, N_SAMPLES, LAM, H2, cg_maxit, block_size)
        result = {"matvec_s": matvec_s, "memread_s": memread_s,
                  "bytes_per_pass": bpp,
                  "ceiling_gbps": max(ceil_pre, ceil_post),
                  "probe_pre_gbps": ceil_pre, "probe_post_gbps": ceil_post}
        try:  # persist: the child's setup (268MB+ over the remote tunnel)
            with open(_matvec_cache_path(), "w") as f:  # often exceeds the
                json.dump(result, f)                    # default budget
        except OSError:
            pass
        print(json.dumps(result))


def _kernel_fingerprint():
    """Short hash of the compute-path sources. Folded into every child
    cache filename so a measurement taken with older kernel code is never
    served as a current number (and so the cache keys on EVERY knob that
    changes the timed program, not just shapes)."""
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.md5()
    for rel in ("sgvamp_tpu/ops/band_kernel.py", "sgvamp_tpu/core/cg.py",
                "sgvamp_tpu/core/vamp.py", "sgvamp_tpu/core/operators.py",
                "sgvamp_tpu/core/precond.py",
                # the probe defines the cached ceiling numbers
                "sgvamp_tpu/ops/membench.py",
                # bench.py itself defines the timing protocol and the
                # problem constants (N_SAMPLES/LAM/H2, block structure) -
                # a protocol change must not be served old measurements
                "bench.py"):
        try:
            with open(os.path.join(root, rel), "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(rel.encode())
    return h.hexdigest()[:8]


def _child_cache_path(mode):
    """Per-config cache of a timing child's measurement (mode: 'matvec',
    'step' or 'solve'). Child setup is dominated by the LD-block device
    transfer over the remote tunnel plus the remote compile service -
    together measured anywhere from ~1 to ~12+ minutes for the same config
    depending on host load - so children routinely blow their budgets on
    bad days. A same-config measurement from an earlier run on the same
    chip is far better evidence than an analytic estimate; results served
    from cache are flagged ({mode}_cached). The key includes every A/B env
    knob (operator/mode/layout/dtype/precond) plus a kernel-source hash,
    so a cached number always matches the config AND code being reported."""
    M, bandwidth, block_size, cg_maxit, _ = _params()
    ld_dtype = os.environ.get("SGVAMP_BENCH_LD_DTYPE", _DEFAULT_LD_DTYPE)
    K = int(os.environ.get("SGVAMP_BENCH_K", "1"))
    op = os.environ.get("SGVAMP_BENCH_OPERATOR", "sym")
    run_mode = os.environ.get("SGVAMP_BENCH_MODE", "streamed")
    layout = os.environ.get("SGVAMP_BENCH_LAYOUT", "diag")
    extra = ""
    if mode == "solve":
        pb = os.environ.get("SGVAMP_BENCH_PRECOND_BLOCK", "64")
        pd = os.environ.get("SGVAMP_BENCH_PRECOND_DTYPE", "bfloat16")
        extra = f"_pb{pb}_{pd}"
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f".bench_{mode}_M{M}_bw{bandwidth}_B{block_size}_{op}_{run_mode}_"
        f"{layout}_{ld_dtype}_K{K}{extra}_{_kernel_fingerprint()}.json")


def _matvec_cache_path():
    return _child_cache_path("matvec")


def main():
    M, bandwidth, block_size, cg_maxit, iters = _params()
    N, lam, h2 = N_SAMPLES, LAM, H2
    # 1500 s default: the children's setup is dominated by the LD-block
    # device transfer over the remote tunnel plus the remote compile
    # service, together measured anywhere from ~1 to ~12 minutes for the
    # same 268 MB + cached program depending on host load; 480 s starved
    # every child on a bad day and even 600 s starved the step child once.
    budget = float(os.environ.get("SGVAMP_BENCH_BUDGET_S", "1500"))
    t_start = time.time()

    _stage("building problem")
    t0 = time.time()
    band, r, x0 = build_problem(M, bandwidth, N, lam, h2,
                                K=int(os.environ.get("SGVAMP_BENCH_K", "1")))
    gen_s = time.time() - t0
    if r.ndim == 2:  # CPU baseline runs the first cohort's system
        r = r[0]

    def remaining():
        return budget - (time.time() - t_start) - 45  # reserve for baseline

    # step child FIRST: it is the headline number and must never be
    # starved by the roofline probe; the matvec estimate fallback is
    # normally available from the same-config cache anyway.
    got = run_child("step", min(1000.0, remaining())) if remaining() > 120 else None
    step_cached = False
    if got is None and os.path.exists(_child_cache_path("step")):
        try:
            with open(_child_cache_path("step")) as f:
                got = json.load(f)
            step_cached = True
            _stage("step numbers served from same-config cache")
        except (OSError, ValueError):
            got = None
    mv = run_child("matvec", min(240.0, remaining())) if remaining() > 90 else None
    matvec_cached = False
    if mv is None and os.path.exists(_matvec_cache_path()):
        try:
            with open(_matvec_cache_path()) as f:
                mv = json.load(f)
            matvec_cached = True
            _stage("matvec numbers served from same-config cache")
        except (OSError, ValueError):
            mv = None
    solve = (run_child("solve", remaining())
             if remaining() > 90
             and os.environ.get("SGVAMP_BENCH_SOLVE", "1") == "1" else None)
    solve_cached = False
    if (solve is None and os.environ.get("SGVAMP_BENCH_SOLVE", "1") == "1"
            and os.path.exists(_child_cache_path("solve"))):
        try:
            with open(_child_cache_path("solve")) as f:
                solve = json.load(f)
            solve_cached = True
            _stage("solve numbers served from same-config cache")
        except (OSError, ValueError):
            solve = None
    # Starved-round insurance: if BOTH timing children were served from
    # same-config caches (the tunnel's compile-service lottery ate their
    # budgets - the whole of BENCH_r04 shipped that way), spend leftover
    # budget on a FRESH quarter-size step child (same chip, same config
    # knobs, 1/4 the transfer) so the round records at least one
    # live-measured number alongside the cached full-size ones.
    fresh_cert = None
    if (step_cached and matvec_cached and remaining() > 120
            and os.environ.get("SGVAMP_BENCH_SIZE", "large") == "large"):
        _stage("both children cached; running fresh quarter-size cert")
        sub = run_child("step", min(420.0, remaining()),
                        extra_env={"SGVAMP_BENCH_SIZE": "medium"})
        if sub is not None:
            samples_m = sub.get("iter_s_samples", [])
            fresh_cert = {
                "M": 131072,
                "iter_ms_median": round(float(np.median(samples_m)) * 1e3, 2)
                if samples_m else -1.0,
                "compile_s": round(sub.get("compile_s", -1.0), 1),
                "state_finite": sub.get("finite", False),
                "xla_cache_entries": sub.get("xla_cache_entries", -1),
            }
    matvec_s = mv["matvec_s"] if mv else float("nan")
    ceiling_gbps = mv.get("ceiling_gbps", float("nan")) if mv else float("nan")
    align = got.get("align", -1.0) if got else -1.0
    align_best = got.get("align_best", -1.0) if got else -1.0
    align_best_it = got.get("align_best_it", -1) if got else -1
    align_stop = got.get("align_stop", -1.0) if got else -1.0
    stop_it = got.get("stop_it", -1) if got else -1
    stop_reason = got.get("stop_reason") if got else None
    if got is not None:
        samples = got["iter_s_samples"]
        iter_s = float(np.median(samples))
        iter_s_min = float(np.min(samples))
        compile_s, finite = got["compile_s"], got["finite"]
        step_timed = True
    elif mv is not None:
        # Conservative estimate from the measured matvec: every LD pass of
        # the fused CG costs at least one matvec (CG vector ops overlap;
        # estimate agrees with direct step timing within ~10% when both
        # are available).
        iter_s = iter_s_min = matvec_s * (cg_maxit + 2)
        samples = []
        compile_s, finite, step_timed = -1.0, True, False
    else:
        iter_s = iter_s_min = float("inf")
        samples, compile_s, finite, step_timed = [], -1.0, False, False

    _stage("measuring CPU baseline")
    base_s, base_parts = baseline_cpu(band, r, N, lam, h2, cg_maxit)
    _stage("done")

    operator = os.environ.get("SGVAMP_BENCH_OPERATOR", "sym")
    ld_dtype = os.environ.get("SGVAMP_BENCH_LD_DTYPE", _DEFAULT_LD_DTYPE)
    K = int(os.environ.get("SGVAMP_BENCH_K", "1"))
    if mv is not None:
        # exact accounting from the operator itself (includes int8 scales)
        bytes_per_pass = mv["bytes_per_pass"]
    else:  # analytic fallback (parent does no device work)
        itemsize = {"bfloat16": 2, "int8": 1, "int4": 0.5}.get(ld_dtype, 4)
        nb = -(-M // block_size)
        hb = -(-bandwidth // block_size)
        nd = (hb + 1) if operator == "sym" else (2 * hb + 1)
        bytes_per_pass = int(K * nb * nd * block_size * block_size * itemsize)
        if ld_dtype == "int8":  # per-block f32 dequant scales stream too
            bytes_per_pass += K * nb * nd * 4
        elif ld_dtype == "int4":  # per-ROW f32 dequant scales
            bytes_per_pass += K * nb * nd * block_size * 4
    # Traffic accounting: the fused multi-RHS CG reads the block array
    # once per iteration for BOTH solves (the reference pays two reads),
    # plus one initial-residual pass and one fused gamw-learning pass.
    passes = cg_maxit + 2

    def _num(x, digits=4):
        return round(x, digits) if np.isfinite(x) else -1.0

    matvec_gbps = bytes_per_pass / matvec_s / 1e9 if mv else float("nan")
    # The ceiling is the best HBM rate DEMONSTRATED on this chip in this
    # child: the DMA read probe bracketing the matvec (before/after), or
    # the matvec itself when it moves bytes faster than the probe (the
    # streamed kernel's multi-stream read+write pattern can beat a pure
    # single-stream read - measured 773 vs 762 GB/s; a 2-stream probe
    # variant measured WORSE, 228 GB/s, strided halves). ceiling >= matvec
    # therefore holds by construction, and frac = 1.0 means "the kernel is
    # the fastest HBM mover we can demonstrate on this chip". The raw
    # probe numbers are reported alongside for transparency.
    if mv is not None and np.isfinite(matvec_gbps):
        ceiling_gbps = float(np.nanmax([ceiling_gbps, matvec_gbps]))
    result = {
        "metric": f"vamp_iters_per_sec_M{M//1024}k",
        "value": _num(1.0 / iter_s),
        "unit": "iter/s",
        "vs_baseline": _num(base_s / iter_s, 2),
        "iter_ms": _num(iter_s * 1e3, 2),
        "iter_ms_median": _num(iter_s * 1e3, 2),
        "iter_ms_min": _num(iter_s_min * 1e3, 2),
        "iter_ms_samples": [round(s * 1e3, 2) for s in samples],
        "markers_per_sec": _num(M / iter_s, 0),
        "ld_passes_per_iter": passes,
        "bytes_per_pass": int(bytes_per_pass),
        "effective_GBps": _num(bytes_per_pass * passes / iter_s / 1e9, 1),
        # Mathematical matvec FLOPs (2 RHS x mul+add x nnz of the band),
        # independent of storage layout - the BASELINE.md GFLOP/s metric.
        "cg_GFLOPs_per_chip": _num(
            2 * 2 * K * M * (2 * bandwidth + 1) * passes / iter_s / 1e9, 1),
        # Chained-and-differenced per-pass matvec (no dispatch overhead).
        "matvec_ms": _num(matvec_s * 1e3, 3),
        "matvec_GBps": _num(matvec_gbps, 1),
        # Best demonstrated HBM rate this run (see comment above):
        # max(probe before matvec, probe after, matvec itself), so
        # ceiling >= matvec by construction.
        "hbm_read_ceiling_GBps": _num(ceiling_gbps, 1),
        "hbm_read_probe_pre_GBps": _num(mv.get("probe_pre_gbps", float("nan")), 1) if mv else -1.0,
        "hbm_read_probe_post_GBps": _num(mv.get("probe_post_gbps", float("nan")), 1) if mv else -1.0,
        # True when the matvec/ceiling numbers came from a same-config
        # earlier run on this chip (the live child's tunnel transfer
        # exceeded its budget; see _matvec_cache_path)
        "matvec_cached": matvec_cached,
        "step_cached": step_cached,
        "hbm_spec_GBps": HBM_SPEC_GBPS,
        "roofline_frac_vs_spec": _num(matvec_gbps / HBM_SPEC_GBPS, 3),
        "roofline_frac_vs_ceiling": _num(matvec_gbps / ceiling_gbps, 3)
        if np.isfinite(matvec_gbps * ceiling_gbps) else -1.0,
        "compile_s": round(compile_s, 1),
        "xla_cache_entries": got.get("xla_cache_entries", -1) if got else -1,
        "gen_s": round(gen_s, 1),
        # state after the timed blocks; each block restarts from the it=1
        # snapshot, so this is finite whenever iters+1 steps are (it no
        # longer depends on how far past the operating point the quality
        # gate pushed the iteration)
        "state_finite": finite,
        # alignment vs the true signal after the REFERENCE's default
        # iteration budget (iterations=10, src/main.py:37) - the
        # operating point of this early-stopped algorithm.
        "align_vs_x0": _num(align),
        # best alignment over the 10 gate iterations and where it peaked
        # (the reference selects per-iteration results post-hoc from its
        # metrics CSV; configs that destabilize late still peak early)
        "align_best_vs_x0": _num(align_best),
        "align_best_it": int(align_best_it),
        # the HEADLINE quality number: alignment of the iterate the
        # engine's truth-free StopMonitor selects (gam1-peak snapshot,
        # core/vamp.py) - what a production run with --stop-on-divergence
        # delivers WITHOUT peeking at x0, vs the reference's manual
        # post-hoc CSV selection
        "align_stop_vs_x0": _num(align_stop),
        "stop_it": int(stop_it),
        "stop_reason": stop_reason,
        "step_timed": step_timed,
        # Production-mode time-to-tolerance: plain vs block-Jacobi
        # preconditioned CG on a realistically ill-conditioned panel.
        "solve_rtol1e5": solve,
        "solve_cached": solve_cached,
        # Fresh quarter-size re-certification, present ONLY when both
        # full-size children starved and were served from cache (see the
        # starved-round insurance above): a live device measurement from
        # THIS run proving chip + code still perform.
        "fresh_cert": fresh_cert,
        "baseline_iter_s": round(base_s, 2),
        "baseline_parts": {k: round(v, 4) for k, v in base_parts.items()},
        "M": M, "bandwidth": bandwidth, "cg_maxit": cg_maxit,
        "block_size": block_size,
        "operator": operator, "ld_dtype": ld_dtype, "K": K,
        "layout": os.environ.get("SGVAMP_BENCH_LAYOUT", "diag"),
        # The CPU baseline is component-measured on a shared 2-vCPU host
        # and varies ~2x with host load; iter/s (value) is the solid
        # number, vs_baseline is indicative only.
        "vs_baseline_note": "CPU baseline varies ~2x with host load",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    mode = os.environ.get("SGVAMP_BENCH_CHILD")
    if mode:
        child_main(mode)
    else:
        main()
