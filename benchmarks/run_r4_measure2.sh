#!/bin/bash
# Round-4 follow-up queue: blocked stem + dy-stacked banded DCN.
set -x
cd "$(dirname "$0")/.."

echo "=== [A] blocked stem (new default), r3 DCN ==="
timeout 3600 python bench.py

echo "=== [B] blocked stem + dy-stack + bf16 acc (full r4 combo) ==="
CENTERNET_TPU_DCN_STACK=1 CENTERNET_TPU_DCN_ACC=bf16 timeout 3600 python bench.py

echo "=== [C] dy-stack alone (f32 acc) ==="
CENTERNET_TPU_DCN_STACK=1 timeout 3600 python bench.py

echo "=== [D] conv-ablation ceiling with blocked stem ==="
CENTERNET_TPU_DCN_IMPL=conv timeout 3000 python bench.py

echo "=== [E] infer attribution at the full r4 combo ==="
CENTERNET_TPU_DCN_STACK=1 CENTERNET_TPU_DCN_ACC=bf16 \
    timeout 3000 python benchmarks/profile_forward.py --top 30 --hlo-map
