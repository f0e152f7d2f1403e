#!/bin/bash
# Round-5 TPU queue, part 2 — the transfer-setting trained-parity chain
# (VERDICT r4 #3) and the COCO-evaluator decisive-mAP diff (VERDICT r4 #4):
#
#   build3:  COCO-60 source fixture (80-cat registry, separated colors)
#            + all-20 VOC fixture with reference shot lists
#   phase 1: COCO-60 transfer pretrain (our stack, TPU) → phase1.pth
#   COCO diff: identical weights through BOTH COCO evaluator chains
#            (results-json → COCOeval → per-category AP)
#   phase 2: 'ours' transfer 5-shot fine-tune (conf := conf_novel(20),
#            no fc_base — reference RFB_Net_vgg.py:268-269) → both-stacks
#            VOC eval → diff (the paper's headline protocol)
#
# && -gated (ADVICE r4 #3); TPU steps run under the hang watchdog.
set -x
cd /root/repo || exit 1
RUN="bash scripts/run_tpu_step.sh"

T=.parity_tr
if [ ! -f $T/diff2_ok ]; then
  { [ -d $T/coco/annotations ] \
    || timeout 1800 python scripts/real_parity.py build3 --out $T \
        --images 1800 --test-images 128 > /tmp/r5T_build.log 2>&1; } \
  && { [ -f $T/phase1.pth ] \
    || $RUN /tmp/r5T_train1.log 900 timeout 4800 \
        python scripts/real_parity.py train --out $T \
        --dataset COCO --iters 9000 --batch 64 \
        --export-name phase1.pth; } \
  && $RUN /tmp/r5T_evalc.log 600 timeout 3000 \
      python scripts/real_parity.py eval-ours --out $T \
      --dataset COCO --phase 1 --setting transfer --load-name phase1.pth \
  && timeout 3600 python scripts/ref_parity_torch.py --eval-only \
      --dataset COCO --load-name phase1.pth --out $T \
      > /tmp/r5T_refc.log 2>&1 \
  && python scripts/real_parity.py diff --out $T --dataset COCO \
      > /tmp/r5T_diffc.log 2>&1 \
  && touch $T/diff1_ok \
  && $RUN /tmp/r5T_train2.log 900 timeout 2400 \
      python scripts/real_parity.py train2 --out $T \
      --setting transfer --shot 5 --iters 600 --batch 64 \
  && $RUN /tmp/r5T_evalv.log 600 timeout 3000 \
      python scripts/real_parity.py eval-ours --out $T \
      --phase 2 --setting transfer \
  && timeout 5400 python scripts/ref_parity_torch.py --eval-only \
      --phase 2 --setting transfer --out $T > /tmp/r5T_refv.log 2>&1 \
  && python scripts/real_parity.py diff --out $T --phase 2 \
      --setting transfer > /tmp/r5T_diffv.log 2>&1 \
  && touch $T/diff2_ok
  tail -3 /tmp/r5T_train1.log; cat /tmp/r5T_diffc.log
  tail -3 /tmp/r5T_train2.log; cat /tmp/r5T_diffv.log
fi
[ -f $T/diff2_ok ] || echo "TRANSFER CHAIN FAILED"
echo QUEUE2_DONE
