#!/bin/bash
# Round-5 perf queue (after the transfer chain): batch-128 train line,
# XLA scoped-VMEM flag A/B, then the full bench (headline + train + 512).
set -x
cd /root/repo || exit 1
RUN="bash scripts/run_tpu_step.sh"

# 1. batch-128 train (VERDICT r4 #2 suggested measuring it too)
CT_TT_BATCH=128 $RUN /tmp/r5_tt128.log 900 timeout 2400 \
  python scripts/time_train.py
tail -2 /tmp/r5_tt128.log

# 2. scoped-VMEM headroom A/B at batch 64 (more fusion room for the
#    elementwise stacks; Pallas kernels request <=15.5MB so a 32M scope
#    still admits them)
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=32768" \
  $RUN /tmp/r5_tt_vmem.log 900 timeout 2400 python scripts/time_train.py
tail -2 /tmp/r5_tt_vmem.log

echo PERF_QUEUE_DONE
