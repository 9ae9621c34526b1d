#!/bin/bash
# Round-4 measurement queue (VERDICT r3 item 1a/1b + 3):
#  - re-measure the plain-conv ceiling on TODAY's code (post bf16-BN fix,
#    post approx_max_k) — the round-2 336.7 img/s number is stale
#  - current-default device attribution (infer + train, HLO-metadata join)
#  - DCN backward knobs end to end: REMAT=dots, ACC=bf16, both
set -x
cd "$(dirname "$0")/.."

echo "=== [1] conv-ablation ceiling (infer + train) ==="
CENTERNET_TPU_DCN_IMPL=conv timeout 3000 python bench.py

echo "=== [2] current-default infer attribution ==="
timeout 3000 python benchmarks/profile_forward.py --top 30 --hlo-map

echo "=== [3] current-default train attribution ==="
timeout 4800 python benchmarks/profile_forward.py --train --top 30 --hlo-map

echo "=== [4] REMAT=dots train ==="
CENTERNET_TPU_DCN_REMAT=dots timeout 3000 python bench.py

echo "=== [5] ACC=bf16 ==="
CENTERNET_TPU_DCN_ACC=bf16 timeout 3000 python bench.py

echo "=== [6] REMAT=dots + ACC=bf16 ==="
CENTERNET_TPU_DCN_REMAT=dots CENTERNET_TPU_DCN_ACC=bf16 timeout 3000 python bench.py
