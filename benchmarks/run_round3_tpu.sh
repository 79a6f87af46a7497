#!/bin/bash
# Round-3 TPU regeneration: run each leg in a FRESH process (an axon
# UNIMPLEMENTED eager op poisons its process — see utils/compat.py notes).
# Usage: bash benchmarks/run_round3_tpu.sh [quick]
set -x
cd "$(dirname "$0")/.."

timeout 580 python benchmarks/tpu_smoke.py 2>&1 | tail -12

# MXU grad-kernel decision data (VERDICT item 6) + fused-backward grid
timeout 580 python benchmarks/bench_suite.py grad_mxu 2>&1 | tail -12

# den-mat noisy-QML planar route + batched QML grid-axis route
timeout 580 python benchmarks/bench_suite.py denmat 2>&1 | tail -4
timeout 580 python benchmarks/bench_suite.py batched_qml 2>&1 | tail -4

# stale / missing artifact rows (VERDICT items 3, 5, 7 + loop rows)
timeout 580 python benchmarks/bench_suite.py torontonian 2>&1 | tail -10
timeout 580 python benchmarks/bench_suite.py hafnian 2>&1 | tail -6
timeout 580 python benchmarks/bench_suite.py mbqc 2>&1 | tail -8
timeout 580 python benchmarks/bench_suite.py permanent 2>&1 | tail -12
timeout 580 python benchmarks/bench_suite.py hessian 2>&1 | tail -18
timeout 580 python benchmarks/bench_suite.py gradient_adjoint 2>&1 | tail -6

# headline
timeout 580 python bench.py
