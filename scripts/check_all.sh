#!/usr/bin/env bash
# Run every CPU-side gate in one go (the routine for "is the tree green"):
#   fast tier -> slow tier -> true 2-process multiproc check -> multichip
#   dryrun.  TPU perf gates (perf_check, bench) run separately on the chip.
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== fast tier =="
python -m pytest tests/ -q -m "not slow" -x
echo "== slow tier (full suite) =="
python -m pytest tests/ -q
echo "== overfit convergence gate (tiny, CPU) =="
JAX_PLATFORMS=cpu python scripts/overfit_gate.py --tiny
echo "== end-to-end learnability gate (train -> dump -> AP eval, CPU) =="
JAX_PLATFORMS=cpu python scripts/learnability_gate.py
echo "== multi-process trainer check =="
python scripts/multiproc_check.py
echo "== multichip dryrun (8 virtual devices) =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
echo "ALL CHECKS PASSED"
