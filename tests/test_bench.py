"""bench.py smoke tests: the driver runs bench.py at round end, so its
child protocol must stay healthy. Runs the step child at the small size on
CPU (SGVAMP_BENCH_PLATFORM forces the platform; the JAX_PLATFORMS env var
is swallowed by this environment)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_step_child_small_cpu(tmp_path):
    env = dict(os.environ)
    env.update(
        SGVAMP_BENCH_CHILD="step",
        SGVAMP_BENCH_SIZE="small",
        SGVAMP_BENCH_PLATFORM="cpu",
        SGVAMP_COMPILE_CACHE="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON from bench child: {out.stderr[-500:]}"
    got = json.loads(lines[-1])
    assert got["finite"] is True
    assert got["iter_s_samples"], "step child must report per-block samples"
    assert all(s > 0 for s in got["iter_s_samples"])


def test_bench_step_child_reports_stop_fields(tmp_path):
    """The step child's quality gate runs the engine's StopMonitor and
    must report the auto-selected iterate's alignment (the headline
    quality number) alongside the post-hoc best."""
    env = dict(os.environ)
    env.update(
        SGVAMP_BENCH_CHILD="step",
        SGVAMP_BENCH_SIZE="small",
        SGVAMP_BENCH_PLATFORM="cpu",
        SGVAMP_COMPILE_CACHE="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON from bench child: {out.stderr[-500:]}"
    got = json.loads(lines[-1])
    for key in ("align_stop", "stop_it", "stop_reason", "align_best"):
        assert key in got
    # on the small panel the monitor's truth-free selection must land on
    # (essentially) the same iterate the post-hoc truth-peak finds
    assert got["align_stop"] > 0.95
    assert got["align_stop"] >= got["align_best"] - 0.02
    # timing blocks restart from the it=1 snapshot: state stays finite
    # regardless of how the gate trajectory ends
    assert got["finite"] is True
