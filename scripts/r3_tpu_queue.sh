#!/bin/bash
# Round-3 TPU measurement queue — run SOLO once the tunnel relay is back.
# Order matters: cheapest/most-informative first; each step logs to /tmp.
set -x
cd /root/repo

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

# 1. CT backward A/B: row-major vs class-major (expect cm << rm)
timeout 2400 python scripts/bench_ct_bwd.py > /tmp/q_ct_bwd.log 2>&1
tail -8 /tmp/q_ct_bwd.log

# 1b. Layout-tax microbench (C=64 lane padding + wgrad orientation)
timeout 2400 python scripts/bench_layout.py > /tmp/q_layout.log 2>&1
grep -E "GB/s|ms|TF" /tmp/q_layout.log | head -12

# 2. Train-step profile with both kernel fixes (CT cm bwd + pool VJP)
timeout 3000 python scripts/profile_train.py > /tmp/q_ptrain.log 2>&1
grep -E "Steps=|ms x" /tmp/q_ptrain.log | head -25

# 3. Full bench (headline + train rate)
timeout 3600 python bench.py > /tmp/q_bench.json 2> /tmp/q_bench.log
cat /tmp/q_bench.json; tail -5 /tmp/q_bench.log
