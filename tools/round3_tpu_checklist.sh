#!/bin/bash
# Round-3 TPU validation checklist — run the moment the axon relay is back.
# Each step logs to /tmp/r3_*.log and keeps going on failure so one broken
# step doesn't mask the rest. Run from the repo root with:
#   bash tools/round3_tpu_checklist.sh
set -u
cd /root/repo
# script-mode python replaces sys.path[0] with the script's dir; keep the
# package (and the axon sitecustomize) importable
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" > "/tmp/r3_$name.log" 2>&1
  rc=$?
  tail -5 "/tmp/r3_$name.log"
  echo "=== $name exit $rc ==="
}

# 0. device sanity (fail fast if the relay is still wedged)
TMO=180 run probe python /tmp/tpu_probe.py || exit 1

# 1. fast test tier (golden byte-exactness + kernels, compile-heavy cases
#    excluded); first compiles populate the persistent cache
TMO=3000 run fast_tests python -m pytest tests/ -x -q -m "not slow"

# 2. slow tier (long-segment kernels, NOPTREX geometry, bias clamp case)
TMO=3000 run slow_tests python -m pytest tests/ -q -m "slow"

# 3. flagship bench (BENCH_r03 preview)
TMO=1200 run bench python bench.py

# 4. geometry sweep -> GEOMETRY_BENCH.json (VERDICT targets: escape/nab_m2
#    decode >= 3.5, NOPTREX encode >= 8 / decode >= 6, Nab harmonic >= 28)
TMO=3000 run geometry python tools/bench_geometries.py

# 5. single-chip scaling evidence -> SCALING.json
TMO=1800 run scaling python tools/singlechip_scaling.py

# 6. per-stage profile (kernel vs compaction split after the tiled change)
TMO=1200 run profile python tools/profile_stages.py

# 7. cold-start measurement: clear process (not disk cache) and time warmup
TMO=1200 run warmup python -c "
import time, deltarice_tpu
t0 = time.perf_counter()
dt = deltarice_tpu.warmup(verbose=True)
print('warmup_s', dt, 'total_s', time.perf_counter() - t0)
"
echo "checklist done; logs in /tmp/r3_*.log"
