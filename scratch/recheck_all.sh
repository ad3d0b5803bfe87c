#!/bin/bash
# Consolidated re-check hooks (VERDICT r4 #7): one command that re-validates
# every measured-negative / environment-dependent conclusion on the CURRENT
# libtpu + tunnel. Run whenever the TPU stack drifts (new libtpu, new jax,
# new chip) before trusting the shipped defaults.
#
# Each probe prints its own verdict; compare against the committed tables in
# docs/PERFORMANCE.md (section cited per step). Serialize TPU access — run
# nothing else against the tunnel while this executes.
set -e
cd /root/repo
echo "=== 1/6 baseline guard (docs/PERFORMANCE.md 'Throughput progression') ==="
timeout 1200 python bench.py --assert-baseline || echo "BASELINE GUARD TRIPPED — re-measure fold policy (scratch/measure_fold.sh)"
echo "=== 2/6 Winograd / Mosaic small-matmul ceiling (PERFORMANCE.md 'Negative results') ==="
timeout 1200 python scratch/wino_double_probe.py
echo "=== 3/6 fp8/int8 conv routes (PERFORMANCE.md 'Reduced precision') ==="
timeout 1200 python scratch/fp8_conv_probe.py
echo "=== 4/6 fp8 end-to-end (PERFORMANCE.md 'fp8 END-TO-END') ==="
UNET_TPU_CONV_FP8=all timeout 1200 python bench.py || echo "fp8 e2e probe failed"
echo "=== 5/6 serving batch + scoped-VMEM sweep (PERFORMANCE.md 'Train batch ceiling') ==="
timeout 1800 python scratch/serving_sweep_r4.py
echo "=== 6/6 egress probe (README 'missing items': real Pet data + ViT-B-16.pt) ==="
python - <<'EOF'
import socket
try:
    socket.gethostbyname("thor.robots.ox.ac.uk"); print("EGRESS OPEN — run the readiness chain: pipeline on the real archive, fetch ViT-B-16.pt, train, evaluate vs BASELINE.md")
except OSError as e:
    print(f"egress still closed ({e}) — accuracy-parity and pretrained-CLIP items remain blocked")
EOF
echo "=== recheck_all done ==="
