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
