#!/bin/bash
# Round-4 queue 3: hand-VJP banded backward (CENTERNET_TPU_DCN_BWD=vjp).
set -x
cd "$(dirname "$0")/.."

echo "=== [F] hand-VJP + bf16 acc (blocked stem default) ==="
CENTERNET_TPU_DCN_BWD=vjp CENTERNET_TPU_DCN_ACC=bf16 timeout 3600 python bench.py

echo "=== [G] hand-VJP, f32 acc ==="
CENTERNET_TPU_DCN_BWD=vjp timeout 3600 python bench.py

echo "=== [H] train attribution, hand-VJP + bf16 ==="
CENTERNET_TPU_DCN_BWD=vjp CENTERNET_TPU_DCN_ACC=bf16 \
    timeout 4800 python benchmarks/profile_forward.py --train --top 20 --hlo-map
