#!/bin/bash
# Round-5 TPU artifact regeneration (VERDICT r4 items 1-8).
# Each leg runs in a FRESH process (an axon UNIMPLEMENTED eager op poisons
# its process — utils/compat.py) under a per-leg cap; sections flush rows
# incrementally and resume, so repeating a leg completes its grid.
# Stale rows (chain-engine n14/n18 gradient cells, pre-fix shardmap rows)
# are wiped ONCE up front (wipe_r5_stale.py, marker-guarded).
set -x
cd "$(dirname "$0")/.."

python benchmarks/wipe_r5_stale.py

# headline-path ablations first: chain engine (new), window w8 cell,
# fusion-with-windows, roofline (VERDICT items 1, 5)
for i in 1 2 3; do
  timeout 1200 python benchmarks/bench_suite.py chain 2>&1 | tail -6
done
timeout 1200 python benchmarks/bench_suite.py window 2>&1 | tail -4
timeout 1200 python benchmarks/bench_suite.py fusion_window 2>&1 | tail -5
timeout 1200 python benchmarks/bench_suite.py roofline 2>&1 | tail -8

# reference grids (item 3): gradient l10 rows + re-measured n14/n18 cells
for i in 1 2 3 4; do
  timeout 1200 python benchmarks/bench_suite.py gradient 2>&1 | tail -20
done
timeout 1200 env DQ_BENCH_RETRY_FAILED=1 python benchmarks/bench_suite.py batched_qml 2>&1 | tail -4
for i in 1 2 3; do
  timeout 1200 env DQ_BENCH_RETRY_FAILED=1 python benchmarks/bench_suite.py hessian 2>&1 | tail -18
done
timeout 1200 env DQ_BENCH_RETRY_FAILED=1 python benchmarks/bench_suite.py gradient_adjoint 2>&1 | tail -4

# engines whose implementation changed this round (items 2, 4, 8)
for i in 1 2; do
  timeout 1200 python benchmarks/bench_suite.py torontonian 2>&1 | tail -10
done
timeout 1200 python benchmarks/bench_suite.py mbqc 2>&1 | tail -6
for i in 1 2; do
  timeout 1200 python benchmarks/bench_suite.py shardmap_grad 2>&1 | tail -6
done

# headline
timeout 1200 python bench.py 2>&1 | tail -3
