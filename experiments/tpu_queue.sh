#!/bin/bash
# Round-4 TPU work queue with tunnel-recovery polling.
#
# The axon tunnel wedges for minutes-to-hours (see CLAUDE.md and the
# round-2 ROADMAP note); this driver probes with a tiny matmul and runs
# the queued TPU jobs one at a time the moment the tunnel answers,
# checkpointing progress in experiments/tpu_queue.state so it can be
# killed/restarted safely.  One TPU process at a time, every job under
# its own timeout.
set -u
cd /root/repo
STATE=experiments/tpu_queue.state
LOG=/tmp/tpu_queue.log
touch "$STATE"

probe() {
  timeout 75 python -c "
from flash_attention_metal_tpu.utils.timing import calibrate
c = calibrate(iters=3)
print('probe ok', round(c['matmul8192_ms'], 3), 'ms, ok=', c['ok'])
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
  # 1. Ladder (incl. the new tri-backward rungs 31-32) on the real chip.
  run_step ladder 590 python -m flash_attention_metal_tpu.harness.verify || continue
  # 2. Backward autotune at the flagship training shape: races split vs
  #    fused vs the new tri backward, persists the winner.
  run_step bwd_train 1500 python -c "
from flash_attention_metal_tpu.harness.autotune import autotune_bwd
autotune_bwd((16, 8, 2048, 64), force=True)
" || continue
  # 3. GQA-fold backward paired measurement (VERDICT item 3 evidence).
  run_step gqa_pair 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/gqa_bwd_pair.py || continue
  # 3b. Tri backward at the GQA-fold training shape (persists the
  #     winner under the folded bwd cache key).
  run_step tri_fold_race 900 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tri_bwd_fold_race.py || continue
  # 4. Causal per-phase cost model (VERDICT item 1 evidence).
  run_step phases 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/causal_phases.py || continue
  # 5. Small-N causal tri race: N=256/512 amortized shapes (entries were
  #    cleared below before the sweep phase re-races them).
  run_step clear_smalln 60 python -c "
import json
c = json.load(open('autotune_cache.json'))
for k in ['v5e/fwd/b32h1q256kv256d64/causal1/bfloat16',
          'v5e/fwd/b8h1q512kv512d64/causal1/bfloat16']:
    c.pop(k, None)
json.dump(c, open('autotune_cache.json','w'), indent=2, sort_keys=True)
print('cleared')
" || continue
  run_step sweep_causal 590 python -m flash_attention_metal_tpu.harness.autotune --phase sweep-causal || continue
  # 6. Paired validation of every tuned fwd entry (drops noise crowns).
  run_step validate 590 python -m flash_attention_metal_tpu.harness.autotune --phase validate || continue
  # 7. Benchmark CSV + JSON (calibration included in both).
  run_step benchmark 1150 python -m flash_attention_metal_tpu.harness.benchmark --json benchmark_results.json || continue
  # 8. Driver metric + detail artifact.
  run_step bench 590 python bench.py || continue
  # 9. Training-step MFU, plain and softcap (round-4 in-kernel bwd).
  run_step train_bench 590 python -m flash_attention_metal_tpu.harness.train_bench || continue
  run_step keep_tb 10 cp train_bench.json train_bench_plain.json || continue
  run_step train_softcap 590 python -m flash_attention_metal_tpu.harness.train_bench --softcap 20 || continue
  run_step swap_tb 10 bash -c "mv train_bench.json train_bench_softcap.json && mv train_bench_plain.json train_bench.json" || continue
  echo "== $(date +%H:%M:%S) QUEUE COMPLETE" >> "$LOG"
  break
done
