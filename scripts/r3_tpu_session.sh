#!/bin/bash
# Pending on-chip measurements for round 3 (run when the TPU tunnel is up).
# One JAX process at a time; everything logs under /tmp/r3_tpu/.
set -x
mkdir -p /tmp/r3_tpu
cd "$(dirname "$0")/.."

# 1. dymn train-step cost attribution (VERDICT r2 #9)
timeout 1200 python scripts/bench_train_stages.py dymn                 > /tmp/r3_tpu/stages_dymn.log 2>&1
timeout 1200 python scripts/bench_train_stages.py dymn,no_dyconv       > /tmp/r3_tpu/stages_nodyconv.log 2>&1
timeout 1200 python scripts/bench_train_stages.py dymn,no_dyrelu       > /tmp/r3_tpu/stages_nodyrelu.log 2>&1

# 2. pointwise lowering probe + in-model A/B
timeout 1200 python scripts/probe_pw_shared.py 120                     > /tmp/r3_tpu/pw_shared.log 2>&1
timeout 1200 python scripts/bench_train_stages.py dymn,pw_form=shared_out > /tmp/r3_tpu/stages_pw_shared_out.log 2>&1

# 3. the full graded bench (compile cache warm from prior runs)
timeout 3600 python bench.py                                           > /tmp/r3_tpu/bench.json 2>/tmp/r3_tpu/bench.err

tail -5 /tmp/r3_tpu/*.log /tmp/r3_tpu/bench.json
