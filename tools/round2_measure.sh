#!/bin/bash
# Round-2 on-hardware measurement battery: run when the axon TPU tunnel is
# back. Measures the three opt-in tiers built during the outage and the
# current default config. Each step subprocess-isolated (the axon runtime
# dislikes re-execution after other sizable executables; tpu_smoke.py
# docstring). Expect ~15 min total (first-compile dominated).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/r2m

# 0. sanity: parity + repeat-execution + default-perf on the real chip
timeout 1200 python tools/tpu_smoke.py 2>&1 | tee /tmp/r2m/smoke.log | tail -5

# 1. full tier sweep (expand x payload x span x scan) at the headline
#    workload — the ranked table picks the new defaults
timeout 2400 python tools/tier_compare.py 2>&1 | tee /tmp/r2m/tiers.log | tail -22

# 2. scan impls + stage ablations inside the packed kernel
timeout 1200 python tools/blend_ablation.py 2>&1 | tee /tmp/r2m/scan.log | tail -10

# 3. ellipse spans end-to-end (rect vs ellipse frame time, same workload)
timeout 1200 python tools/span_compare.py 2>&1 | tee /tmp/r2m/span.log | tail -6

# 4. triangle primary paths on reference scenes (block vs binned)
timeout 1800 python tools/tri_bench.py 2>&1 | tee /tmp/r2m/tri.log | tail -30

echo "=== summary ==="
grep -h "ms/frame\|Mrays\|PSNR\|max=" /tmp/r2m/*.log | tail -20
