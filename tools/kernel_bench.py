"""A/B timing harness for the LD-operator kernels on the real TPU chip.

Times chained in-device matvec passes (lax.fori_loop inside one jit, so
per-call dispatch overhead - milliseconds over the remote tunnel - is
excluded; this is the number that matters inside the fused CG loop).

Usage:
  python tools/kernel_bench.py [--M 524288] [--bandwidth 256] [--B 256]
      [--K 1] [--S 2] [--passes 50] [--dtype bfloat16]
      [--variants resident8,resident16,streamed16,...]

Prints one JSON line per variant: {"variant": ..., "ms_per_pass": ...,
"GBps": <upper-block HBM bytes / pass time>}.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(M, bandwidth, seed=0):
    import os

    from sgvamp_tpu.data.simulate import simulate_ld_band

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         f".bench_problem_M{M}_bw{bandwidth}_s{seed}.npz")
    if os.path.exists(cache):
        with np.load(cache) as d:
            return d["band"]
    rng = np.random.default_rng(seed)
    band, _, _ = simulate_ld_band(300000, M, bandwidth, h2=0.7, lam=0.01,
                                  rng=rng, dtype=np.float32)
    return band


def time_passes(op, x, n):
    import jax

    # op rides as a jit ARGUMENT (it is a pytree), never a closure capture:
    # captured arrays are embedded in the serialized module and the remote
    # compile service rejects >512MB requests (HTTP 413). k is a TRACED
    # trip count so the n-pass and 2n-pass chains share one compiled
    # program (the compile service can take minutes per program).
    @jax.jit
    def chain(o, v, k):
        # 0.02 damping keeps the iterate finite over k unnormalized passes
        return jax.lax.fori_loop(
            0, k, lambda i, v: o.matvec(v) * 0.02, v)

    def timed(k, reps=4):
        # min-of-reps first: remote-tunnel dispatch spikes (100-400 ms)
        # would otherwise poison the difference
        _ = float(chain(op, x, k)[0, 0])  # compile + warm; concrete fetch
        best = float("inf")
        for i in range(reps):
            t0 = time.time()
            _ = float(chain(op, x * (1.0 + 1e-6 * (i + 1)), k)[0, 0])
            best = min(best, time.time() - t0)
        return best

    # difference n vs 2n chains: dispatch + pipeline-fill costs cancel
    t_n, t_2n = timed(n), timed(2 * n)
    return max((t_2n - t_n) / n, 1e-12)


def time_cg(op, x, n):
    """Per-CG-iteration cost (matvec + axpys/dots), the in-step unit cost."""
    import jax
    import jax.numpy as jnp

    from sgvamp_tpu.core.cg import cg_batched

    lanes = x.shape[0]
    gamw = jnp.full((lanes,), 5.0, jnp.float32)
    gam2 = jnp.full((lanes,), 1.0, jnp.float32)

    @jax.jit
    def solve(o, b):
        def amatvec(v):
            return gamw[:, None] * o.matvec(v) + gam2[:, None] * v
        return cg_batched(amatvec, b, jnp.zeros_like(b), maxiter=n,
                          force_maxiter=True).x

    y = solve(op, x)
    _ = float(y[0, 0])
    t0 = time.time()
    y = solve(op, x)
    _ = float(y[0, 0])
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=524288)
    ap.add_argument("--bandwidth", type=int, default=256)
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--K", type=int, default=1)
    ap.add_argument("--S", type=int, default=2)
    ap.add_argument("--passes", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--variants", default="resident8,streamed8,streamed16")
    ap.add_argument("--cg", action="store_true",
                    help="also time a full CG iteration (matvec + vector ops)")
    ap.add_argument("--platform", default=None,
                    help="force a jax backend (e.g. cpu) for smoke runs")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (OSError, AttributeError):
        pass
    import jax.numpy as jnp

    from sgvamp_tpu.core.operators import BandedLD
    from sgvamp_tpu.ops.band_kernel import SymBandedLD

    band = build(args.M, args.bandwidth)
    rng = np.random.default_rng(1)

    def make(variant):
        # grammar: einsum | [slab](resident|streamed|window)?[G]
        # e.g. resident8, streamed16, slab, slabstreamed16, slabresident8
        if variant.startswith("einsum"):
            return BandedLD.from_band(band, block_size=args.B, K=args.K,
                                      dtype=args.dtype)
        rest = variant
        layout = "diag"
        if rest.startswith("slab"):
            layout, rest = "slab", rest[len("slab"):]
        op = SymBandedLD.from_band(band, block_size=args.B, K=args.K,
                                   dtype=args.dtype, layout=layout)
        kw = {}
        for mode in ("resident", "streamed", "window"):
            if rest.startswith(mode):
                rest = rest[len(mode):]
                kw["mode"] = "resident" if mode == "window" else mode
                kw["window"] = mode == "window"
        if rest:
            kw["rows_per_step"] = int(rest)
        return dataclasses.replace(op, **kw)

    def time_memread(op, n):
        """DMA-bound HBM read ceiling over the block array (pallas probe,
        see sgvamp_tpu.ops.membench - a generic jnp reduction is VPU-bound
        and understates the ceiling by >2x)."""
        from sgvamp_tpu.ops.membench import measure_read_gbps

        ub = op.upper if hasattr(op, "upper") else jax.tree_util.tree_leaves(op)[0]
        gbps, per_pass = measure_read_gbps(
            ub, n=max(10, n // 2), interpret=jax.default_backend() != "tpu")
        # normalize so the shared bytes_per_pass/dt division below reports
        # the probe's true GB/s
        return op.bytes_per_pass() / (gbps * 1e9)

    for variant in args.variants.split(","):
        try:
            if variant == "memread":
                op = make("resident")
                dt = time_memread(op, args.passes)
                bytes_pass = op.bytes_per_pass()
                print(json.dumps({
                    "variant": "memread", "M": args.M, "dtype": args.dtype,
                    "ms_per_pass": round(dt * 1e3, 4),
                    "GBps": round(bytes_pass / dt / 1e9, 1),
                }), flush=True)
                continue
            op = make(variant)
            jax.block_until_ready(jax.tree_util.tree_leaves(op)[0])
            x = jnp.asarray(
                rng.normal(size=(args.S * args.K, op.M)).astype(np.float32))
            dt = time_passes(op, x, args.passes)
            bytes_pass = op.bytes_per_pass()
            row = {
                "variant": variant, "M": args.M, "K": args.K, "S": args.S,
                "B": args.B, "bandwidth": args.bandwidth, "dtype": args.dtype,
                "ms_per_pass": round(dt * 1e3, 4),
                "GBps": round(bytes_pass / dt / 1e9, 1),
            }
            if args.cg:
                dt_cg = time_cg(op, x, args.passes)
                row["ms_per_cg_iter"] = round(dt_cg * 1e3, 4)
                row["vector_overhead_ms"] = round((dt_cg - dt) * 1e3, 4)
            print(json.dumps(row), flush=True)
        except Exception as e:  # keep going: one variant OOMing is data too
            print(json.dumps({"variant": variant,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            sys.stderr.flush()


if __name__ == "__main__":
    main()
