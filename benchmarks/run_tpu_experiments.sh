#!/bin/bash
# Round-3 TPU experiment queue — run when the chip is reachable.
# Each step is independently useful; later steps use earlier results.
set -x
cd "$(dirname "$0")/.."

# 1. gather tap-mode shootout at the 64^2 middle band (the six while-loops)
timeout 1200 python benchmarks/bench_dcn_variants.py --scale 64 --channels 128 \
    --radius 4 --only gather,gather_u,gather_1

# 2. and at 32^2 C256 (currently banded; fused gather might win)
timeout 1200 python benchmarks/bench_dcn_variants.py --scale 32 --channels 256 \
    --radius 4 --only banded,gather,gather_u,gather_1

# 3. headline bench with all round-3 commits (approx_max_k, unrolled gather,
#    bf16 heads)
timeout 3000 python bench.py

# 4. fresh device profile to re-attribute
timeout 3000 python benchmarks/profile_forward.py --top 30 --hlo-map

# 5. tap-stacked weight matmul at inference (one deep [.., KK*Ci] @ [KK*Ci, Co]
#    dot instead of 9 thin per-tap dots; parity-gated, unmeasured)
CENTERNET_TPU_DCN_WMM=stack timeout 3000 python bench.py

# 6. bf16 accumulation for the selection einsums at inference
#    (~2^-8 relative rounding on the 2-term bilinear sums; halves t_dy traffic)
CENTERNET_TPU_DCN_ACC=bf16 timeout 3000 python bench.py

# 7. fine-map radius-1 probe (skew study: 0.30 px box delta — borderline;
#    only flip the default if the train->AP gate certifies it)
CENTERNET_TPU_DCN_RADIUS_FINE=1 timeout 3000 python bench.py
