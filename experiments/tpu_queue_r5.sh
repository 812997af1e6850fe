#!/bin/bash
# Round-5 TPU work queue: full re-race under the new kernels (pv_transposed
# fwd/bwd tri, base-2 backward, raced V1 tiles) + artifact regeneration
# under the 2^23 amortization.  Same tunnel-recovery polling as round 4's
# queue; checkpointed in experiments/tpu_queue_r5.state.
set -u
cd /root/repo
STATE=experiments/tpu_queue_r5.state
LOG=/tmp/tpu_queue_r5.log
echo $$ > /tmp/tpu_queue_r5.pid
touch "$STATE"

probe() {
  # Health gate: the quick calibrate(iters=3) probe reads ~6 ms on a
  # HEALTHY tunnel (it includes the ~3 ms/launch dispatch floor; the
  # harness's proper dual-slope reading is ~0.75 ms) — so gate only on
  # outright hangs/errors and gross (>3x) degradation.
  timeout 75 python -c "
from flash_attention_metal_tpu.utils.timing import calibrate
c = calibrate(iters=3)
print('probe', round(c['matmul8192_ms'], 3), 'ms, ok=', c['ok'])
import sys
sys.exit(0 if c['matmul8192_ms'] < 20.0 else 1)
" >> "$LOG" 2>&1
}

run_step() {  # run_step <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  grep -qx "$name" "$STATE" && return 0
  echo "== $(date +%H:%M:%S) step $name" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "== step $name rc=$rc" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "$name" >> "$STATE"
    return 0
  fi
  return 1  # leave un-checkpointed; retried after next probe
}

while true; do
  if ! probe; then
    echo "$(date +%H:%M:%S) tunnel down; sleeping" >> "$LOG"
    sleep 240
    continue
  fi
  # 1. Ladder on the real chip (incl. tri pvt routing paths).
  run_step ladder 590 python -m flash_attention_metal_tpu.harness.verify || continue
  # 2. One-time cache reset: every fwd/bwd decision re-raced under the
  #    round-5 kernels (gqabwd route entries kept; re-raced in step 7).
  run_step clear_cache 60 python -c "
import json
c = json.load(open('autotune_cache.json'))
keep = {k: v for k, v in c.items() if '/gqabwd/' in k}
json.dump(keep, open('autotune_cache.json','w'), indent=2, sort_keys=True)
print('cleared', len(c) - len(keep), 'entries; kept', len(keep))
" || continue
  # 3-5. Full re-race at the benchmark + train shapes (resumable: tuned
  #      keys are cached, so a timeout kill resumes where it left off).
  run_step sweep 2400 python -m flash_attention_metal_tpu.harness.autotune --phase sweep || continue
  run_step sweep_causal 2400 python -m flash_attention_metal_tpu.harness.autotune --phase sweep-causal || continue
  run_step train 2400 python -m flash_attention_metal_tpu.harness.autotune --phase train || continue
  # 6. GQA-fold training-shape backward (incl. pvt candidates).
  run_step fold_race 1200 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tri_bwd_fold_race.py || continue
  # 7. GQA fold-vs-broadcast route re-race (the fold path got 1.34x
  #    faster; the crossover may have moved).
  run_step gqa_pair 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/gqa_bwd_pair.py || continue
  # 8. Paired validation of every tuned entry vs the shipped fallback.
  run_step validate 1200 python -m flash_attention_metal_tpu.harness.autotune --phase validate || continue
  # 9. Coverage audit: every benchmark shape must be raced (exit 0).
  run_step audit 120 python -m flash_attention_metal_tpu.harness.autotune --phase audit || continue
  # 10. Benchmark CSV + JSON under the 2^23 amortization.
  run_step benchmark 1800 python -m flash_attention_metal_tpu.harness.benchmark --json benchmark_results.json || continue
  # 11. SVG artifacts from the fresh CSV.
  run_step plots 120 python -m flash_attention_metal_tpu.harness.plotting benchmark_results.csv || continue
  # 12. Driver metric + detail artifact.
  run_step bench 1200 python bench.py || continue
  # 13. Training MFU, plain and softcap (fresh backward).
  run_step train_bench 590 python -m flash_attention_metal_tpu.harness.train_bench || continue
  run_step keep_tb 10 cp train_bench.json train_bench_plain.json || continue
  run_step train_softcap 590 python -m flash_attention_metal_tpu.harness.train_bench --softcap 20 || continue
  run_step swap_tb 10 bash -c "mv train_bench.json train_bench_softcap.json && mv train_bench_plain.json train_bench.json" || continue
  # 14. Serving tokens/s snapshot.
  run_step serving 590 python -m flash_attention_metal_tpu.harness.serving || continue
  echo "== $(date +%H:%M:%S) QUEUE COMPLETE" >> "$LOG"
  break
done
