"""Flake-proofing of the bench harness (VERDICT r4 #2).

The round-4 driver bench died in Ray core (raylet FATAL -> rc=1) and
printed nothing, losing the whole round's perf record. bench.py now
runs the bench body in a supervised inner subprocess with per-stage
try/except and a partial-JSON sidecar flushed after every stage. These
tests force both loss modes via env hooks and assert a parseable JSON
line with the surviving stages still comes out:

- soft failure: a stage raises -> recorded in ``errors``, the run
  continues and exits rc=0 with the one JSON line;
- hard death: the inner process os._exit()s mid-run (the r4 raylet
  mode) -> the supervisor recovers the sidecar and emits the partial
  results plus ``errors.harness``.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env):
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="2",
        GRAFT_PAGE_REPLICATE="2",
        GRAFT_HEADLINE_ONLY="1",
        GRAFT_BENCH_RUNS="2",
        **extra_env,
    )
    # the bench subprocess owns its own Ray session (separate local
    # cluster from the pytest fixture's)
    env.pop("RAY_ADDRESS", None)
    p = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True,
        timeout=600,
    )
    line = None
    for cand in reversed(p.stdout.strip().splitlines()):
        try:
            parsed = json.loads(cand)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(parsed, dict) and "metric" in parsed:
            line = parsed
            break
    return p, line


def test_stage_failure_still_emits_json():
    # the headline stage raises before doing any work; the harness must
    # record the error and still print the one JSON line, rc=0
    p, out = _run_bench({"GRAFT_BENCH_FORCE_FAIL": "quality_filter"})
    assert p.returncode == 0, p.stderr[-2000:]
    assert out is not None, p.stdout
    assert out["metric"] == "quality_filter_wall_sec"
    assert "quality_filter" in out.get("errors", {}), out
    assert "forced failure" in out["errors"]["quality_filter"]
    # the failed stage's number is absent, not fabricated
    assert out["value"] is None


def test_hard_inner_death_recovers_partial():
    # the inner process os._exit(134)s right after the headline stage
    # (the r4 raylet loss mode); the supervisor must recover the
    # sidecar's partial results and annotate the harness death
    p, out = _run_bench({
        "GRAFT_BENCH_FORCE_FAIL": "quality_filter",
        "GRAFT_BENCH_FORCE_ABORT_AFTER": "quality_filter",
    })
    assert p.returncode == 0, p.stderr[-2000:]
    assert out is not None, p.stdout
    errors = out.get("errors", {})
    assert "harness" in errors and "rc=134" in errors["harness"], out
    # the pre-death stage record survived in the sidecar
    assert "quality_filter" in errors
