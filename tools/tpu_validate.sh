#!/bin/bash
# Standing TPU validation — run before shipping any kernel/routing change.
# Each step logs to /tmp/val_*.log and keeps going on failure so one broken
# step doesn't mask the rest. From the repo root:
#   bash tools/tpu_validate.sh [fast|full]
# "fast" = device probe + fast tests + bench + perf gate (pre-commit tier);
# "full" adds the slow test tier, geometry sweep, scaling, profile, warmup.
set -u
cd /root/repo
TIER=${1:-fast}
# script-mode python replaces sys.path[0] with the script's dir; keep the
# package (and the axon sitecustomize) importable
export PYTHONPATH=/root/repo:/root/.axon_site
fail=0
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" > "/tmp/val_$name.log" 2>&1
  rc=$?
  tail -5 "/tmp/val_$name.log"
  echo "=== $name exit $rc ==="
  [ $rc -ne 0 ] && fail=1
}

# 0. device sanity (fail fast if the relay is wedged)
TMO=180 run probe python -c "
import jax; d = jax.devices()[0]
assert d.platform == 'tpu', d
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
print('tpu ok:', d)
" || exit 1

# 1. fast test tier (golden byte-exactness + kernels; first compiles
#    populate the persistent cache). Round-5 lesson: monolithic suite
#    runs can wedge the dev relay server-side for 20-40 min under their
#    compile storm (the process freezes on a futex with zero CPU) —
#    when that happens, kill the EXACT pytest pid, wait for a trivial
#    device probe to answer again, and re-run per test FILE so each
#    process session stays short (see /tmp-style chunking in the round-5
#    TPU_VALIDATE artifact).
TMO=3000 run fast_tests python -m pytest tests/ -x -q -m "not slow"

# 2. flagship bench + perf-regression gate: >10% drop vs the last
#    committed BENCH_r*.json fails the run loudly. This is the gate that
#    would have caught the round-3 tiled-default regression (17.7->12.9).
TMO=1200 run bench python bench.py
TMO=60 run perf_gate python tools/perf_gate.py /tmp/val_bench.log

if [ "$TIER" = full ]; then
  # 3. slow tier (long-segment kernels, NOPTREX geometry, bias clamp)
  TMO=3000 run slow_tests python -m pytest tests/ -q -m "slow"

  # 4. geometry sweep -> GEOMETRY_BENCH.json (targets: escape/nab_m2
  #    decode >= 3.5, NOPTREX enc >= 8 / dec >= 6, Nab harmonic >= 28)
  TMO=3000 run geometry python tools/bench_geometries.py --out GEOMETRY_BENCH.json

  # 5. single-chip scaling evidence -> SCALING_CHIP.json
  TMO=1800 run scaling python tools/singlechip_scaling.py

  # 6. per-stage profile (kernel vs compaction split, routing-aware)
  TMO=1200 run profile python tools/profile_stages.py

  # 7. cold-start: clear process (not disk cache) and time warmup
  TMO=1200 run warmup python -c "
import time, deltarice_tpu
t0 = time.perf_counter()
dt = deltarice_tpu.warmup(verbose=True)
print('warmup_s', dt, 'total_s', time.perf_counter() - t0)
"
fi
echo "validation ($TIER) done; logs in /tmp/val_*.log; fail=$fail"
exit $fail
