"""True multi-process trainer validation (VERDICT r1 missing item #4).

Runs scripts/multiproc_check.py as a subprocess: 2 coordinator-connected
processes x 4 virtual CPU devices each vs the single-process 8-device
reference, over the compact two-phase training path.  The script asserts
losses match to float precision, step-0 gradients agree at reduction-noise
tolerance, and final params agree at Adam-amplified tolerance (see the
script docstring for why bitwise params are unattainable across collective
implementations).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_compact_training_matches_single_process():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the script pins its own device counts
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multiproc_check.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=540,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no verdict line; stderr: {proc.stderr[-1000:]}"
    verdict = json.loads(lines[-1])
    assert verdict["ok"], verdict
    assert verdict["loss0_ok"] and verdict["grads_ok"], verdict
    assert verdict["params_ok"] and verdict["losses_ok"], verdict
    # the tolerances must come from the run's own order-noise probe
    assert verdict["derived_grad_tol"] > 0 and verdict["derived_param_tol"] > 0
