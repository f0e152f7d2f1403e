#!/bin/bash
# Patient retry for the 512 phase-2 chain: each long remote compile may
# need a die-and-retry cycle before the server-side compile cache makes
# it fast (the external path drops connections idle ~8 min). Loop the
# watchdogged step until diff_ok or the attempt budget runs out.
set -x
cd /root/repo || exit 1
RUN="bash scripts/run_tpu_step.sh"
A=.parity_p2_512

for i in 1 2 3 4 5; do
  [ -f $A/diff_ok ] && break
  if [ ! -f $A/ref_model.pth ]; then
    $RUN /tmp/r5A_train2.log 720 timeout 2400 \
        python scripts/real_parity.py train2 --out $A \
        --size 512 --accum 4 --batch 64 --iters 400 --shot 5 || continue
  fi
  $RUN /tmp/r5A_eval.log 720 timeout 3000 \
      python scripts/real_parity.py eval-ours --out $A \
      --phase 2 --size 512 || continue
  timeout 5400 python scripts/ref_parity_torch.py --eval-only \
      --phase 2 --setting incre --out $A --size 512 \
      > /tmp/r5A_ref.log 2>&1 || continue
  python scripts/real_parity.py diff --out $A --phase 2 --size 512 \
      > /tmp/r5A_diff.log 2>&1 && touch $A/diff_ok
done
cat /tmp/r5A_diff.log 2>/dev/null
[ -f $A/diff_ok ] && echo STAGE_A_DONE || echo STAGE_A_STILL_FAILING
