#!/bin/bash
# Round-5 serial runner after queue 1. Strictly serial (1-core host +
# tunnel); every TPU step goes through the run_tpu_step.sh hang watchdog
# (two tunnel-connection drops this round hung jobs mid-compile).
set -x
cd /root/repo || exit 1
RUN="bash scripts/run_tpu_step.sh"

# 0a. stage-B remainder: full-bench-config eval (its 10:54 attempt lost
#     the tunnel) + reference-side 500-image eval + diff
B=.parity_p2
if [ ! -f $B/sweep500_ok ]; then
  $RUN /tmp/r5B_eval_full.log 480 timeout 3000 \
      python scripts/real_parity.py eval-ours --out $B \
      --phase 2 --int8 --int8-heads --bf16 --approx --pool \
  && $RUN /tmp/r5B_ref.log 900 timeout 5400 \
      python scripts/ref_parity_torch.py --eval-only \
      --phase 2 --setting incre --out $B \
  && python scripts/real_parity.py diff --out $B --phase 2 \
      > /tmp/r5B_diff.log 2>&1 \
  && touch $B/sweep500_ok
  cat /tmp/r5B_diff.log
fi

# 0b. stage-A remainder: 512 phase-2 fine-tune chain from the surviving
#     phase1.pth (the 09:48 train2 hung the same way)
A=.parity_p2_512
if [ ! -f $A/diff_ok ] && [ -f $A/phase1.pth ]; then
  $RUN /tmp/r5A_train2.log 900 timeout 2400 \
      python scripts/real_parity.py train2 --out $A \
      --size 512 --accum 4 --batch 64 --iters 400 --shot 5 \
  && $RUN /tmp/r5A_eval.log 600 timeout 3000 \
      python scripts/real_parity.py eval-ours --out $A \
      --phase 2 --size 512 \
  && timeout 5400 python scripts/ref_parity_torch.py --eval-only \
      --phase 2 --setting incre --out $A --size 512 \
      > /tmp/r5A_ref.log 2>&1 \
  && python scripts/real_parity.py diff --out $A --phase 2 --size 512 \
      > /tmp/r5A_diff.log 2>&1 \
  && touch $A/diff_ok
  tail -3 /tmp/r5A_train2.log
  cat /tmp/r5A_diff.log
fi

# 1. flash kernel gradient tests (CPU, interpret mode)
timeout 1800 python -m pytest tests/test_ct_attention.py -x -q \
  > /tmp/r5_ct_tests.log 2>&1
tail -3 /tmp/r5_ct_tests.log
grep -q " passed" /tmp/r5_ct_tests.log || { echo FLASH_TESTS_FAILED; exit 1; }

# 2. CT backward A/B on chip (r4 kernels vs flash)
$RUN /tmp/r5_ctbwd_ab.log 600 timeout 2400 python scripts/bench_ct_bwd.py
tail -16 /tmp/r5_ctbwd_ab.log

# 3. conv1_1 feed-layout A/B on chip
$RUN /tmp/r5_conv1_ab.log 600 timeout 2400 python scripts/bench_conv1.py
tail -12 /tmp/r5_conv1_ab.log

# 4. smoke the new transfer-chain plumbing on CPU at tiny scale before
#    burning TPU time on it
timeout 900 python - > /tmp/r5_smoke_build3.log 2>&1 <<'EOF'
import os, subprocess, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
os.environ["JAX_PLATFORMS"] = "cpu"
r = subprocess.run([sys.executable, "scripts/real_parity.py", "build3",
                    "--out", "/tmp/smoke_tr", "--images", "12",
                    "--test-images", "6"], capture_output=True, text=True)
print(r.stdout[-2000:], r.stderr[-2000:]); assert r.returncode == 0
from ct_tpu.data.coco import COCODetection
from ct_tpu.data.augment import RawCanvasTransform
ds = COCODetection("/tmp/smoke_tr/coco", [("2014", "split_nonvoc_train")],
                   RawCanvasTransform(384))
assert len(ds) == 12 and len(ds.class_names) == 60, (
    len(ds), len(ds.class_names))
img, t = ds[0]
assert img.shape == (384, 384, 3) and t.shape[1] == 6, (img.shape, t.shape)
assert 1 <= t[:, 4].min() and t[:, 4].max() <= 60
dse = COCODetection("/tmp/smoke_tr/coco",
                    [("2014", "split_nonvoc_minival")], None)
assert len(dse) == 6
print("ours-side COCO fixture OK")
EOF
tail -3 /tmp/r5_smoke_build3.log
grep -q "ours-side COCO fixture OK" /tmp/r5_smoke_build3.log \
  || { echo BUILD3_SMOKE_FAILED; exit 1; }

timeout 900 python - > /tmp/r5_smoke_refcoco.log 2>&1 <<'EOF'
import sys
sys.path.insert(0, "/root/repo/scripts")
from ref_parity_torch import install_stubs
install_stubs()
from data import COCODetection
ds = COCODetection("/tmp/smoke_tr/coco", [("2014", "split_nonvoc_minival")],
                   None)
assert ds.num_classes == 60, ds.num_classes
assert len(ds.ids) == 6
print("reference-side COCO fixture OK")
EOF
tail -3 /tmp/r5_smoke_refcoco.log
grep -q "reference-side COCO fixture OK" /tmp/r5_smoke_refcoco.log \
  || { echo REFCOCO_SMOKE_FAILED; exit 1; }

# 5. transfer + COCO parity chain (uses the watchdog inside)
bash scripts/r5_tpu_queue2.sh > /tmp/r5_queue2.log 2>&1
tail -20 /tmp/r5_queue2.log
echo AFTER_QUEUE1_DONE
