#!/bin/bash
# Round-4 TPU artifact regeneration: every planar-path section re-recorded
# with the wire-relabel scheduler + MXU window engine (the shipped default).
# Each leg runs in a FRESH process (an axon UNIMPLEMENTED eager op poisons
# its process — utils/compat.py) under the 580 s cap; sections flush rows
# incrementally and resume, so repeating a leg completes its grid.
# DQ_BENCH_RETRY_FAILED=1 legs retry cells recorded as 'failed' (the hessian
# grid failed pre-fwd_ad-fallback; adjoint n18 failed pre-fix).
set -x
cd "$(dirname "$0")/.."

for i in 1 2 3; do
  timeout 580 python benchmarks/bench_suite.py gradient 2>&1 | tail -20
done
for i in 1 2; do
  timeout 580 python benchmarks/bench_suite.py gradient_large 2>&1 | tail -5
done
for i in 1 2; do
  timeout 580 python benchmarks/bench_suite.py window 2>&1 | tail -6
done
timeout 580 python benchmarks/bench_suite.py roofline 2>&1 | tail -8
timeout 580 python benchmarks/bench_suite.py batched_qml 2>&1 | tail -4
timeout 580 python benchmarks/bench_suite.py denmat 2>&1 | tail -4
for i in 1 2 3; do
  timeout 580 env DQ_BENCH_RETRY_FAILED=1 python benchmarks/bench_suite.py hessian 2>&1 | tail -18
done
timeout 580 python benchmarks/bench_suite.py shardmap_grad 2>&1 | tail -6
timeout 580 env DQ_BENCH_RETRY_FAILED=1 python benchmarks/bench_suite.py gradient_adjoint 2>&1 | tail -4

# headline
timeout 580 python bench.py
