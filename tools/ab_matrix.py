"""Recorded A/B matrix for the LD-storage decision: BENCH_AB.json.

Produces the artifact behind the bench defaults ("int8 LD storage, B=256,
diag layout; int4 is screening-only") that previous rounds only quoted in
README prose:

  * ms/pass for every {bfloat16, int8, int4} x {B=128, 256} x {diag, slab}
    cell - chained in-device matvec passes via tools/kernel_bench.py (one
    subprocess per (dtype, B) pair; both layouts ride one device transfer).
  * iter/s + align_best/align_stop for each dtype at the bench default
    (B=256, diag, streamed) - the REAL step child from bench.py (same
    protocol as the headline), quantifying int4's accuracy cost at M=512k
    rather than asserting it. iter_s_est on every cell derives from
    ms/pass x (cg_maxit + 2) LD passes (documented to agree with direct
    step timing within ~10% when both exist) and is flagged as derived.

  * production-solve viability per dtype (rtol=1e-5 plain vs
    block-Jacobi CG on the strength=4 ill-conditioned panel) - the row
    that disqualifies int4 for production: its 16-level quantization
    degrades the operator's conditioning fidelity and CG stalls at
    maxiter without converging, while int8 converges with a 2.2x
    preconditioned speedup.

Rows are written incrementally: rerunning resumes a starved matrix
(existing cells are kept unless --fresh). The per-cell measurements also
land in bench.py's child caches, so future headline runs on a starved
tunnel can serve them.

Usage: python tools/ab_matrix.py [--out BENCH_AB.json] [--budget-s 900]
           [--skip-steps] [--fresh] [--platform cpu] [--size small]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DTYPES = ("bfloat16", "int8", "int4", "hybrid")
BLOCKS = (128, 256)
LAYOUTS = ("diag", "slab")
CG_MAXIT = {"small": 20, "large": 100, "xl": 100}
M_OF = {"small": 16384, "large": 524288, "xl": 1048576}


def _bench_default_B(size):
    """The block size bench.py's children run at for this size (the step
    and solve rows use the bench default; the matvec grid sweeps B
    explicitly)."""
    sys.path.insert(0, REPO)
    import bench as _bench

    saved = os.environ.get("SGVAMP_BENCH_SIZE")
    os.environ["SGVAMP_BENCH_SIZE"] = size
    try:
        return _bench._params()[2]
    finally:
        if saved is None:
            os.environ.pop("SGVAMP_BENCH_SIZE", None)
        else:
            os.environ["SGVAMP_BENCH_SIZE"] = saved


def run_kernel_bench(dtype, B, M, bandwidth, passes, budget_s, platform):
    variants = ("streamed", "slabstreamed")
    cmd = [sys.executable, os.path.join(REPO, "tools", "kernel_bench.py"),
           "--M", str(M), "--bandwidth", str(bandwidth), "--B", str(B),
           "--dtype", dtype, "--passes", str(passes),
           "--variants", ",".join(variants)]
    if platform:
        cmd += ["--platform", platform]

    def error_rows(msg):
        # one error row PER variant, so a failure leaves a marker in both
        # the diag and slab cells instead of silently dropping slab
        return [{"error": msg, "dtype": dtype, "B": B, "variant": v}
                for v in variants]

    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=budget_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return error_rows("budget exceeded")
    rows = []
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            rows.append(json.loads(line))
    if not rows:
        return error_rows(out.stderr[-300:])
    return rows


def _with_bench_env(dtype, size):
    """Temporarily set the bench env knobs; returns the saved values."""
    saved = {k: os.environ.get(k)
             for k in ("SGVAMP_BENCH_LD_DTYPE", "SGVAMP_BENCH_SIZE")}
    os.environ["SGVAMP_BENCH_LD_DTYPE"] = dtype
    os.environ["SGVAMP_BENCH_SIZE"] = size
    return saved


def _restore_env(saved):
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def run_bench_child(mode, dtype, size, budget_s, platform):
    """Spawn one bench.py timing child (mode: 'step' or 'solve') and
    return its JSON dict, or an {'error': ...} row."""
    env = dict(os.environ)
    env.update(SGVAMP_BENCH_CHILD=mode, SGVAMP_BENCH_SIZE=size,
               SGVAMP_BENCH_LD_DTYPE=dtype)
    if platform:
        env["SGVAMP_BENCH_PLATFORM"] = platform
    try:
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             env=env, capture_output=True, text=True,
                             timeout=budget_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"error": "budget exceeded"}
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    return {"error": out.stderr[-300:]}


def run_solve_child(dtype, size, budget_s, platform, fresh=False):
    """Production-mode solve A/B at this dtype (bench.py's solve child:
    rtol=1e-5 time-to-tolerance, plain vs block-Jacobi, on the
    strength=4 ill-conditioned panel). Served from bench.py's
    same-config child cache when one exists - the cache key carries
    dtype and a kernel-source hash, so a cached row is a valid
    same-chip measurement of the same code. --fresh bypasses the cache
    (and the live child's completion overwrites it)."""
    sys.path.insert(0, REPO)
    import bench as _bench

    saved = _with_bench_env(dtype, size)
    try:
        cache = _bench._child_cache_path("solve")
    finally:
        _restore_env(saved)
    if not fresh and os.path.exists(cache):
        try:
            with open(cache) as f:
                row = json.load(f)
            row["cached"] = True
            return row
        except (OSError, ValueError):
            pass
    return run_bench_child("solve", dtype, size, budget_s, platform)


def run_step_child(dtype, size, budget_s, platform):
    return run_bench_child("step", dtype, size, budget_s, platform)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_AB.json"))
    ap.add_argument("--size", default="large", choices=list(M_OF))
    ap.add_argument("--bandwidth", type=int, default=256)
    ap.add_argument("--passes", type=int, default=40)
    ap.add_argument("--budget-s", type=float, default=900.0,
                    help="per-subprocess budget")
    ap.add_argument("--skip-steps", action="store_true",
                    help="only the matvec grid, no full-step children")
    ap.add_argument("--skip-solves", action="store_true",
                    help="skip the per-dtype production-solve A/B")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore existing cells and remeasure everything")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    M = M_OF[args.size]
    bandwidth = 128 if args.size == "small" else args.bandwidth
    cg_maxit = CG_MAXIT[args.size]
    doc = {"M": M, "bandwidth": bandwidth, "cg_maxit": cg_maxit,
           "passes": args.passes,
           "ld_passes_per_iter": cg_maxit + 2,
           "protocol": {
               "ms_per_pass": "chained in-device matvec (n vs 2n fori_loop "
                              "chains differenced, min-of-reps), "
                              "tools/kernel_bench.py",
               "iter_s_est": "derived: 1 / (ms_per_pass * ld_passes_per_iter)"
                             " - agrees with direct step timing within ~10%",
               "step": "bench.py step child (snapshot-restart timing + "
                       "10-iteration quality gate with StopMonitor) at the "
                       "bench-default B (recorded per row) diag streamed",
               "solve": "bench.py solve child: rtol=1e-5 time-to-tolerance, "
                        "plain vs block-Jacobi CG, strength=4 "
                        "ill-conditioned panel - the production regime the "
                        "storage decision must survive",
           },
           "matvec_grid": [], "step_by_dtype": {}, "solve_by_dtype": {}}
    if os.path.exists(args.out) and not args.fresh:
        try:
            with open(args.out) as f:
                old = json.load(f)
            # resume only cells measured under the SAME config: a rerun
            # with a different bandwidth/passes must not report old cells
            # under the new header
            if (old.get("M"), old.get("bandwidth"), old.get("passes")) == \
                    (M, bandwidth, args.passes):
                doc["matvec_grid"] = [r for r in old.get("matvec_grid", [])
                                      if "error" not in r or "unsupported" in r]
                doc["step_by_dtype"] = {
                    k: v for k, v in old.get("step_by_dtype", {}).items()
                    if "error" not in v}
                doc["solve_by_dtype"] = {
                    k: v for k, v in old.get("solve_by_dtype", {}).items()
                    if "error" not in v}
        except (OSError, ValueError):
            pass

    def save():
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)

    have = {(r.get("dtype"), r.get("B"), r.get("layout"))
            for r in doc["matvec_grid"]}
    for dtype in DTYPES:
        for B in BLOCKS:
            missing = [lay for lay in LAYOUTS if (dtype, B, lay) not in have]
            if not missing:
                continue
            print(f"[ab] {time.strftime('%H:%M:%S')} matvec {dtype} B={B}",
                  file=sys.stderr, flush=True)
            rows = run_kernel_bench(dtype, B, M, bandwidth, args.passes,
                                    args.budget_s, args.platform)
            for r in rows:
                layout = "slab" if r.get("variant", "").startswith("slab") else "diag"
                cell = {"dtype": dtype, "B": B, "layout": layout}
                if (dtype, B, layout) in have:
                    continue
                if "error" in r:
                    if "diag layout only" in r["error"]:
                        # by design: per-block (int8) / per-row (int4)
                        # dequant scales are laid out for the diag kernel
                        cell["unsupported"] = "quantized storage is diag-only"
                    else:
                        cell["error"] = r["error"]
                else:
                    cell["ms_per_pass"] = r["ms_per_pass"]
                    cell["GBps"] = r["GBps"]
                    cell["iter_s_est"] = round(
                        1e3 / (r["ms_per_pass"] * (cg_maxit + 2)), 3)
                doc["matvec_grid"].append(cell)
                have.add((dtype, B, layout))
            save()

    if not args.skip_steps:
        for dtype in DTYPES:
            if dtype in doc["step_by_dtype"]:
                continue
            print(f"[ab] {time.strftime('%H:%M:%S')} step child {dtype}",
                  file=sys.stderr, flush=True)
            got = run_step_child(dtype, args.size, args.budget_s,
                                 args.platform)
            got["B"] = _bench_default_B(args.size)
            if "error" in got:
                doc["step_by_dtype"][dtype] = got
            else:
                import numpy as np
                s = got["iter_s_samples"]
                doc["step_by_dtype"][dtype] = {
                    "B": got["B"],
                    "iter_ms_median": round(float(np.median(s)) * 1e3, 2),
                    "iter_s": round(1.0 / float(np.median(s)), 3),
                    "align_it10": got["align"],
                    "align_best": got["align_best"],
                    "align_best_it": got["align_best_it"],
                    "align_stop": got.get("align_stop"),
                    "stop_it": got.get("stop_it"),
                    "stop_reason": got.get("stop_reason"),
                    "compile_s": got["compile_s"],
                }
            save()

    if not args.skip_solves:
        for dtype in DTYPES:
            if dtype in doc["solve_by_dtype"]:
                continue
            print(f"[ab] {time.strftime('%H:%M:%S')} solve child {dtype}",
                  file=sys.stderr, flush=True)
            row = run_solve_child(dtype, args.size, args.budget_s,
                                  args.platform, fresh=args.fresh)
            row["B"] = _bench_default_B(args.size)
            doc["solve_by_dtype"][dtype] = row
            save()

    ok = [r for r in doc["matvec_grid"] if "ms_per_pass" in r]
    if ok:
        best = min(ok, key=lambda r: r["ms_per_pass"])
        doc["fastest_cell"] = {k: best[k] for k in ("dtype", "B", "layout",
                                                    "ms_per_pass")}
    save()
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
