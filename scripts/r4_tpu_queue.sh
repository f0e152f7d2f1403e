#!/bin/bash
# Round-4 TPU measurement queue — VERDICT r3 #3: the deferred 512-resolution
# measurements (512 train w/ accumulation, 512 serving, one 512 fixture e2e
# driven to a both-stacks parity diff so the K=4964 CT-kernel blocking is
# proven on hardware). Run SOLO: the tunnel relay starves under host CPU
# contention, so the queue first waits for any suite run to finish.
# Usage: scripts/r4_tpu_queue.sh [wait_pid]
set -x
cd /root/repo

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

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

# 0. 512 parity fixture (CPU, quick): 15 base classes, class-colored
if [ ! -d .parity_512/voc/VOCdevkit ]; then
  timeout 900 python scripts/real_parity.py build --out .parity_512 \
    --images 200 --test-images 96 > /tmp/q4_build.log 2>&1
  tail -2 /tmp/q4_build.log
fi

# 1. Full bench incl. the 512 train (effective batch 64, accum 4) and 512
#    serving numbers (CT_BENCH_512) — the round's tracked measurements
CT_BENCH_512=1 timeout 5400 python bench.py \
  > /tmp/q4_bench.json 2> /tmp/q4_bench.log
cat /tmp/q4_bench.json; tail -8 /tmp/q4_bench.log

# 2. 512 e2e on hardware: train phase-1 at 512 (grad-accum 4) to decisive
#    mAP on the fixture, export .pth
timeout 5400 python scripts/real_parity.py train --out .parity_512 \
  --size 512 --accum 4 --batch 64 --iters 1000 \
  > /tmp/q4_train512.log 2>&1
tail -4 /tmp/q4_train512.log

# 3. evaluate through OUR stack at 512 (TPU)
timeout 3600 python scripts/real_parity.py eval-ours --out .parity_512 \
  --size 512 > /tmp/q4_eval512.log 2>&1
tail -3 /tmp/q4_eval512.log

# 4. evaluate the identical weights through the REFERENCE stack (CPU torch)
timeout 5400 python scripts/ref_parity_torch.py --eval-only \
  --out .parity_512 --size 512 > /tmp/q4_ref512.log 2>&1
tail -3 /tmp/q4_ref512.log

# 5. diff
python scripts/real_parity.py diff --out .parity_512 --size 512 \
  > /tmp/q4_diff512.log 2>&1
cat /tmp/q4_diff512.log
