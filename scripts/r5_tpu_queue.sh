#!/bin/bash
# Round-5 TPU measurement queue, part 1 (VERDICT r4 #1c and #5).
#
# Stage A — 512 phase-2 chain (.parity_p2_512): the CT head trained ON
#   HARDWARE at K=4964 (the one reference capability with no trained 512
#   evidence): build2 fixture → phase-1 512 pretrain (accum 4) →
#   phase-2 incre 5-shot CT fine-tune at 512 → both-stacks eval → diff.
# Stage B — parity-fixture resolution (VERDICT r4 #5): regrow the
#   .parity_p2 test set 128 → 500 images (same seed ⇒ identical images,
#   longer test.txt; the committed ref_model.pth stays valid) and re-run
#   the f32 + int8 calibration sweep + full-bench-config evals and the
#   reference-side eval on the 500-image set.
#
# Stages are && -gated (ADVICE r4 #3): a failed/timed-out step aborts the
# dependent steps instead of diffing stale artifacts. Run SOLO (the
# tunnel relay starves under host CPU contention).
set -x
cd /root/repo || exit 1

probe() {
  python - <<'EOF'
import socket, sys
s = socket.socket(); s.settimeout(2)
try:
    s.connect(("127.0.0.1", 8083)); print("tunnel UP")
except Exception:
    print("tunnel DOWN"); sys.exit(1)
finally:
    s.close()
EOF
}
probe || exit 1

# ---------- Stage A: 512 phase-2 CT-head chain -----------------------------
A=.parity_p2_512
if [ ! -f $A/diff_ok ]; then
  timeout 1200 python scripts/real_parity.py build2 --out $A \
      --images 400 --test-images 128 > /tmp/r5A_build.log 2>&1 \
  && timeout 3000 python scripts/real_parity.py train --out $A \
      --size 512 --accum 4 --batch 64 --iters 1500 \
      --export-name phase1.pth > /tmp/r5A_train1.log 2>&1 \
  && timeout 2400 python scripts/real_parity.py train2 --out $A \
      --size 512 --accum 4 --batch 64 --iters 400 --shot 5 \
      > /tmp/r5A_train2.log 2>&1 \
  && timeout 3000 python scripts/real_parity.py eval-ours --out $A \
      --phase 2 --size 512 > /tmp/r5A_eval.log 2>&1 \
  && timeout 5400 python scripts/ref_parity_torch.py --eval-only \
      --phase 2 --setting incre --out $A --size 512 \
      > /tmp/r5A_ref.log 2>&1 \
  && python scripts/real_parity.py diff --out $A --phase 2 --size 512 \
      > /tmp/r5A_diff.log 2>&1 \
  && touch $A/diff_ok
  tail -3 /tmp/r5A_train1.log; tail -3 /tmp/r5A_train2.log
  cat /tmp/r5A_diff.log
fi
[ -f $A/diff_ok ] || { echo "STAGE A FAILED"; }

# ---------- Stage B: 500-image parity fixture + sweep re-measure -----------
B=.parity_p2
if [ ! -f $B/sweep500_ok ]; then
  rm -rf $B/voc/VOCdevkit/annotations_cache
  timeout 1200 python scripts/real_parity.py build2 --out $B \
      --images 600 --test-images 500 > /tmp/r5B_build.log 2>&1 \
  && timeout 3000 python scripts/real_parity.py eval-ours --out $B \
      --phase 2 > /tmp/r5B_eval_f32.log 2>&1 \
  && timeout 3000 python scripts/real_parity.py eval-ours --out $B \
      --phase 2 --int8 > /tmp/r5B_eval_i8.log 2>&1 \
  && timeout 3000 python scripts/real_parity.py eval-ours --out $B \
      --phase 2 --int8 --calib-images 32 > /tmp/r5B_eval_i8c32.log 2>&1 \
  && timeout 3000 python scripts/real_parity.py eval-ours --out $B \
      --phase 2 --int8 --calib-images 128 > /tmp/r5B_eval_i8c128.log 2>&1 \
  && timeout 3000 python scripts/real_parity.py eval-ours --out $B \
      --phase 2 --int8 --int8-heads --bf16 --approx --pool \
      > /tmp/r5B_eval_full.log 2>&1 \
  && timeout 5400 python scripts/ref_parity_torch.py --eval-only \
      --phase 2 --setting incre --out $B > /tmp/r5B_ref.log 2>&1 \
  && python scripts/real_parity.py diff --out $B --phase 2 \
      > /tmp/r5B_diff.log 2>&1 \
  && touch $B/sweep500_ok
  cat /tmp/r5B_diff.log
  for f in /tmp/r5B_eval_*.log; do echo "== $f"; tail -2 "$f"; done
fi
[ -f $B/sweep500_ok ] || { echo "STAGE B FAILED"; }
echo QUEUE1_DONE
