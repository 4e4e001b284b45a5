#!/bin/bash
# On-chip measurement session: dymn train-step cost attribution (VERDICT r2 #9).
# One JAX process at a time; everything logs under /tmp/r3_tpu/.
# Run the graded bench separately first (python bench.py) so its programs
# are in .jax_cache; these ablation runs then compile only their own steps.
set -x
mkdir -p /tmp/r3_tpu
cd "$(dirname "$0")/.."

timeout 1800 python scripts/bench_train_stages.py dymn                 > /tmp/r3_tpu/stages_dymn.log 2>&1
timeout 1800 python scripts/bench_train_stages.py dymn,no_dyconv       > /tmp/r3_tpu/stages_nodyconv.log 2>&1
timeout 1800 python scripts/bench_train_stages.py dymn,no_dyrelu       > /tmp/r3_tpu/stages_nodyrelu.log 2>&1
timeout 1800 python scripts/bench_train_stages.py dymn,pw_form=shared_out > /tmp/r3_tpu/stages_pw_shared_out.log 2>&1

tail -5 /tmp/r3_tpu/*.log
