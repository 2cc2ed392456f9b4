"""sgvamp_tpu benchmark: VAMP iterations/sec on a biobank-scale banded LD panel.

Measures the full jit-compiled VAMP iteration (denoiser + EM prior + two
CG solves + Hutchinson + gamw learning) on one TPU chip at M=512k markers,
bandwidth 256, with a fixed CG budget (cg_rtol=0 forces exactly cg_maxit
matvecs per solve) so per-iteration work is deterministic.

Default configuration: the symmetric pallas operator with bfloat16 block
storage (SGVAMP_BENCH_OPERATOR/SGVAMP_BENCH_LD_DTYPE override for A/B).
This is numerically equivalent to the float32 einsum operator on TPU —
the MXU truncates f32 matmul operands to bf16 by default, and both paths
accumulate in f32 (measured: alignment agrees to 6 decimals at M=512k) —
while moving ~3x fewer HBM bytes per LD pass (upper-triangle blocks only,
half-width storage).

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


def build_problem(M, bandwidth, N, lam, h2, seed=0):
    from sgvamp_tpu.data.simulate import simulate_ld_band

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_problem_M{M}_bw{bandwidth}_s{seed}.npz")
    if os.path.exists(cache):
        with np.load(cache) as d:
            return d["band"], d["r"], d["x0"]
    rng = np.random.default_rng(seed)
    band, r, x0 = simulate_ld_band(N, M, bandwidth, h2=h2, lam=lam, rng=rng,
                                   dtype=np.float32)
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

    M = r.shape[0]
    cm = max(int(M * lam), 1)
    K = int(os.environ.get("SGVAMP_BENCH_K", "1"))
    _stage("packing blocks + device transfer")
    ld_dtype = os.environ.get("SGVAMP_BENCH_LD_DTYPE", "bfloat16")
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
    prior = PriorState.create(lam, [1.0], [h2 / cm * (N * K)])
    inputs = VampInputs(op=op, r=jnp.asarray(rp),
                        a=jnp.full((K,), 1.0 / K, dt),
                        N=jnp.full((K,), float(N), dt),
                        mask=jnp.asarray(mask))
    state = V.init_state(inputs, cfg, prior, gamw=5.0, gam1=1e-6)
    return op, inputs, state, cfg


def time_matvec_child(band, r, N, lam, h2, cg_maxit, block_size):
    """Roofline: time one operator matvec (2 RHS) on device, plus the pure
    HBM-read ceiling over the same block array (what a reduction that only
    READS the bytes achieves on this chip right now — the honest
    denominator for a bandwidth-bound kernel's roofline fraction)."""
    import jax
    import jax.numpy as jnp

    op, inputs, state, cfg = _setup_tpu(band, r, N, lam, h2, cg_maxit, block_size)
    _stage("timing matvec roofline")
    # NOTE: on the experimental remote-tunnel backend, block_until_ready
    # can return before execution finishes; a concrete scalar fetch is the
    # only reliable barrier, so every timing below ends in one.
    x = inputs.r.repeat(2, axis=0)
    mv = jax.jit(lambda v, i: i.op.matvec(v))
    _ = float(mv(x, inputs)[0, 0])
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        x = mv(x, inputs)
    _ = float(x[0, 0])
    matvec_s = (time.time() - t0) / reps

    _stage("timing HBM read ceiling")
    ub = jax.tree_util.tree_leaves(op)[0]
    n = reps

    @jax.jit
    def read_chain(u, a0):
        # the +a*1e-9 data dependence stops XLA hoisting the reduction out
        # of the loop; abs blocks algebraic simplification
        return jax.lax.fori_loop(
            0, n, lambda i, a: jnp.sum(jnp.abs(u + a * 1e-9),
                                       dtype=jnp.float32), a0)

    _ = float(read_chain(ub, jnp.float32(0.0)))
    t0 = time.time()
    _ = float(read_chain(ub, jnp.float32(1.0)))
    memread_s = (time.time() - t0) / n
    return matvec_s, memread_s


def time_step_child(band, r, N, lam, h2, iters, cg_maxit, block_size, x0=None):
    """Full-step timing (run in a killable subprocess: the step's first
    compile can take minutes on a busy compile service)."""
    import jax

    from sgvamp_tpu.core import vamp as V

    op, inputs, state, cfg = _setup_tpu(band, r, N, lam, h2, cg_maxit, block_size)
    step = jax.jit(lambda s, i: V.vamp_step(s, i, cfg, None))

    _stage("compiling step")
    t0 = time.time()
    state, aux = step(state, inputs)
    _ = float(aux.gamw[0])
    compile_s = time.time() - t0

    _stage("timing steps")
    t0 = time.time()
    for _ in range(iters):
        state, aux = step(state, inputs)
    _ = float(aux.gamw[0])  # chain dependency forces all iters
    iter_s = (time.time() - t0) / iters
    finite = bool(jax.numpy.all(jax.numpy.isfinite(state.xhat2)))
    align = -1.0
    if x0 is not None:
        # sanity: after 1+iters VAMP steps the estimate must correlate with
        # the known true signal (guards "fast but wrong" configurations).
        xh = np.asarray(state.xhat1[: x0.shape[0]], np.float64)
        denom = np.linalg.norm(xh) * np.linalg.norm(x0)
        align = float(np.dot(xh, np.asarray(x0, np.float64)) / denom) if denom else 0.0
    return iter_s, compile_s, finite, align


def run_child(mode, budget_s):
    """Run a timing child under a budget; returns its JSON dict or None.
    Device-side work (including the first compile, which can take minutes
    on a busy remote compile service) only ever happens in these killable
    subprocesses, so the bench always reports."""
    import subprocess

    env = dict(os.environ)
    env["SGVAMP_BENCH_CHILD"] = mode
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
        return 16384, 128, 256, 20, 3
    if size == "xl":  # scale-ceiling demo: combine with SGVAMP_BENCH_K=8
        return 1048576, 256, 256, 100, 3
    return 524288, 256, 256, 100, 3


N_SAMPLES, LAM, H2 = 300000, 0.01, 0.7


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
    band, r, x0 = build_problem(M, bandwidth, N_SAMPLES, LAM, H2)
    if mode == "step":
        iter_s, compile_s, finite, align = time_step_child(
            band, r, N_SAMPLES, LAM, H2, iters, cg_maxit, block_size, x0=x0)
        print(json.dumps({"iter_s": iter_s, "compile_s": compile_s,
                          "finite": finite, "align": align}))
    else:
        matvec_s, memread_s = time_matvec_child(band, r, N_SAMPLES, LAM, H2,
                                                cg_maxit, block_size)
        print(json.dumps({"matvec_s": matvec_s, "memread_s": memread_s}))


def main():
    M, bandwidth, block_size, cg_maxit, iters = _params()
    N, lam, h2 = N_SAMPLES, LAM, H2
    budget = float(os.environ.get("SGVAMP_BENCH_BUDGET_S", "480"))
    t_start = time.time()

    _stage("building problem")
    t0 = time.time()
    band, r, x0 = build_problem(M, bandwidth, N, lam, h2)
    gen_s = time.time() - t0

    def remaining():
        return budget - (time.time() - t_start) - 45  # reserve for baseline

    # matvec child first (its compile is the cheap one) so the estimate
    # fallback is available even when the step compile exceeds the budget.
    mv = run_child("matvec", min(200.0, remaining())) if remaining() > 90 else None
    got = run_child("step", remaining()) if remaining() > 120 else None
    matvec_s = mv["matvec_s"] if mv else float("nan")
    memread_s = mv.get("memread_s", float("nan")) if mv else float("nan")
    align = got.get("align", -1.0) if got else -1.0
    if got is not None:
        iter_s, compile_s, finite = got["iter_s"], got["compile_s"], got["finite"]
        step_timed = True
    elif mv is not None:
        # Conservative estimate from the measured matvec: every LD pass of
        # the fused CG costs at least one matvec (CG vector ops overlap;
        # estimate agrees with direct step timing within ~10% when both
        # are available).
        iter_s = matvec_s * (cg_maxit + 2)
        compile_s, finite, step_timed = -1.0, True, False
    else:
        iter_s, compile_s, finite, step_timed = float("inf"), -1.0, False, False

    _stage("measuring CPU baseline")
    base_s, base_parts = baseline_cpu(band, r, N, lam, h2, cg_maxit)
    _stage("done")

    # Analytic block-array size (parent does no device work).
    operator = os.environ.get("SGVAMP_BENCH_OPERATOR", "sym")
    ld_dtype = os.environ.get("SGVAMP_BENCH_LD_DTYPE", "bfloat16")
    K = int(os.environ.get("SGVAMP_BENCH_K", "1"))
    itemsize = {"bfloat16": 2, "int8": 1}.get(ld_dtype, 4)
    nb = -(-M // block_size)
    hb = -(-bandwidth // block_size)
    nd = (hb + 1) if operator == "sym" else (2 * hb + 1)

    # Traffic accounting: the fused multi-RHS CG reads the block array
    # once per iteration for BOTH solves (the reference pays two reads),
    # plus one initial-residual pass and one fused gamw-learning pass.
    bytes_per_pass = K * nb * nd * block_size * block_size * itemsize
    passes = cg_maxit + 2

    def _num(x, digits=4):
        return round(x, digits) if np.isfinite(x) else -1.0

    result = {
        "metric": f"vamp_iters_per_sec_M{M//1024}k",
        "value": _num(1.0 / iter_s),
        "unit": "iter/s",
        "vs_baseline": _num(base_s / iter_s, 2),
        "iter_ms": _num(iter_s * 1e3, 2),
        "markers_per_sec": _num(M / iter_s, 0),
        "ld_passes_per_iter": passes,
        "effective_GBps": _num(bytes_per_pass * passes / iter_s / 1e9, 1),
        # Mathematical matvec FLOPs (2 RHS x mul+add x nnz of the band),
        # independent of storage layout - the BASELINE.md GFLOP/s metric.
        "cg_GFLOPs_per_chip": _num(
            2 * 2 * K * M * (2 * bandwidth + 1) * passes / iter_s / 1e9, 1),
        "matvec_ms": _num(matvec_s * 1e3, 3),
        "matvec_GBps": _num(bytes_per_pass / matvec_s / 1e9, 1),
        # Same-run pure-read bandwidth over the same block array: the
        # denominator that tracks what this (shared, tunneled) chip can
        # actually move today, vs the 819 GB/s v5e spec sheet.
        "hbm_read_peak_GBps": _num(bytes_per_pass / memread_s / 1e9, 1),
        "roofline_frac_vs_measured_peak": _num(
            memread_s / matvec_s, 3) if np.isfinite(memread_s * matvec_s) else -1.0,
        "compile_s": round(compile_s, 1),
        "gen_s": round(gen_s, 1),
        "state_finite": finite,
        "align_vs_x0": _num(align),
        "step_timed": step_timed,
        "baseline_iter_s": round(base_s, 2),
        "baseline_parts": {k: round(v, 4) for k, v in base_parts.items()},
        "M": M, "bandwidth": bandwidth, "cg_maxit": cg_maxit,
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
