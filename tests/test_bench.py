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


def test_bench_fresh_cert_on_starved_round(tmp_path, monkeypatch, capsys):
    """When BOTH full-size timing children starve and get served from
    same-config caches (the round-4 failure mode), main() must spend
    leftover budget on a fresh quarter-size step child and record it as
    fresh_cert - so a starved round still carries one live measurement."""
    import numpy as np

    import bench

    monkeypatch.setenv("SGVAMP_BENCH_SIZE", "large")
    monkeypatch.delenv("SGVAMP_BENCH_CHILD", raising=False)

    monkeypatch.setattr(bench, "build_problem",
                        lambda *a, **k: (np.zeros((8, 3), np.float32),
                                         np.zeros(8, np.float32),
                                         np.zeros(8, np.float32)))
    monkeypatch.setattr(bench, "baseline_cpu", lambda *a, **k: (1.0, {}))

    cached = {"iter_s_samples": [0.04], "compile_s": 1.0, "finite": True,
              "align": 0.9, "align_best": 0.95, "align_best_it": 2,
              "align_stop": 0.95, "stop_it": 3, "stop_reason": "diverging"}
    cache_dir = tmp_path
    step_path = cache_dir / "step.json"
    mv_path = cache_dir / "mv.json"
    step_path.write_text(json.dumps(cached))
    mv_path.write_text(json.dumps(
        {"matvec_s": 3e-4, "memread_s": 2e-4, "bytes_per_pass": 10 ** 8,
         "ceiling_gbps": 700.0, "probe_pre_gbps": 700.0,
         "probe_post_gbps": 690.0}))
    monkeypatch.setattr(
        bench, "_child_cache_path",
        lambda mode: str(step_path if mode != "matvec" else mv_path))
    monkeypatch.setattr(bench, "_matvec_cache_path", lambda: str(mv_path))
    monkeypatch.setenv("SGVAMP_BENCH_SOLVE", "0")

    calls = []

    def fake_run_child(mode, budget, extra_env=None):
        calls.append((mode, (extra_env or {}).get("SGVAMP_BENCH_SIZE")))
        if extra_env and extra_env.get("SGVAMP_BENCH_SIZE") == "medium":
            return {"iter_s_samples": [0.01, 0.011], "compile_s": 2.5,
                    "finite": True, "xla_cache_entries": 7}
        return None  # full-size children starve

    monkeypatch.setattr(bench, "run_child", fake_run_child)
    bench.main()
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    result = json.loads(out[-1])
    assert result["step_cached"] and result["matvec_cached"]
    fc = result["fresh_cert"]
    assert fc is not None and fc["M"] == 131072
    assert fc["state_finite"] and fc["compile_s"] == 2.5
    assert fc["iter_ms_median"] == 10.5
    assert ("step", "medium") in calls
