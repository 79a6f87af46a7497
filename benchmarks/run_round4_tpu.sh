#!/bin/bash
# Round-4 TPU artifact regeneration: every planar-path section re-recorded
# with the wire-relabel scheduler (ops/planar_gate.py::schedule_rotations).
# Each leg runs in a FRESH process (an axon UNIMPLEMENTED eager op poisons
# its process — utils/compat.py) under the 580 s cap; sections flush rows
# incrementally and resume, so repeating a leg completes its grid.
set -x
cd "$(dirname "$0")/.."

for i in 1 2; do
  timeout 580 python benchmarks/bench_suite.py gradient 2>&1 | tail -20
done
timeout 580 python benchmarks/bench_suite.py gradient_large 2>&1 | tail -5
timeout 580 python benchmarks/bench_suite.py roofline 2>&1 | tail -8
timeout 580 python benchmarks/bench_suite.py batched_qml denmat 2>&1 | tail -6
for i in 1 2 3; do
  timeout 580 python benchmarks/bench_suite.py hessian 2>&1 | tail -18
done
for i in 1 2 3; do
  timeout 580 python benchmarks/bench_suite.py grad_mxu 2>&1 | tail -10
done
timeout 580 python benchmarks/bench_suite.py fusion 2>&1 | tail -5
timeout 580 python benchmarks/bench_suite.py shardmap_grad 2>&1 | tail -6
timeout 580 python benchmarks/bench_suite.py gradient_adjoint 2>&1 | tail -4

# headline
timeout 580 python bench.py
