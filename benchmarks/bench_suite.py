"""Benchmark suite mirroring the reference harness
(reference examples/benchmarks/benchmark_v420): gradient grid, Hessian,
adjoint gradients at large n, permanent/hafnian/torontonian throughput,
gate-apply HBM roofline, and MBQC simulate/transpile latency.

All device timings chain iterations INSIDE one jitted lax.scan so a single
dispatch covers `steps` real evaluations — this defeats both per-call tunnel
latency and the axon result-memoization cache (round-1's n10 permanent
"anomaly" was exactly those two effects).

Usage:
  python benchmarks/bench_suite.py [section|all] [--profile] [--reference]

  --profile    capture a jax.profiler trace per section into benchmarks/traces/
  --reference  also run the mounted PyTorch reference on host CPU over the
               same grids (slow; fills the *_ref_ms tables)

Writes/merges JSON results into benchmarks/results.json.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PROFILE = '--profile' in sys.argv
REFERENCE = '--reference' in sys.argv
RETRY_FAILED = os.environ.get('DQ_BENCH_RETRY_FAILED', '0') == '1'
_HERE = os.path.dirname(os.path.abspath(__file__))

_FAILED = 'failed'     # sentinel: attempted and failed (skip unless retrying)


def _atomic_dump(obj, path):
    """os.replace a temp file over results.json so a process cap landing
    mid-write cannot truncate the artifact (advisor r3)."""
    tmp = path + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)


def _skip_cell(recorded) -> bool:
    """True when a cell should be skipped on resume: a number is always kept;
    a 'failed' sentinel is kept unless DQ_BENCH_RETRY_FAILED=1 (advisor r3:
    a deterministically failing multi-minute cell must not starve the rest
    of the grid at the start of every capped process)."""
    if recorded is None:
        return False
    if recorded == _FAILED:
        return not RETRY_FAILED
    return True


def _merge_row(key, rowkey, value):
    """Persist ONE row of a section immediately (atomic read-merge-replace),
    so a 580 s process cap mid-grid loses at most the in-flight row and a
    rerun of the section resumes instead of restarting."""
    path = os.path.join(_HERE, 'results.json')
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    sec = merged.get(key)
    if not isinstance(sec, dict):
        sec = {}
    sec[rowkey] = value
    merged[key] = sec
    _atomic_dump(merged, path)
    return sec


def _recorded(key) -> dict:
    """Rows already recorded for a section (for skip-on-resume)."""
    path = os.path.join(_HERE, 'results.json')
    if os.path.exists(path):
        with open(path) as f:
            sec = json.load(f).get(key)
        if isinstance(sec, dict):
            return sec
    return {}


@contextlib.contextmanager
def _maybe_profile(tag):
    if not PROFILE:
        yield
        return
    import jax
    path = os.path.join(_HERE, 'traces', tag)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
    print(f'  [profile] {path}')


_RT_MS = None


def _roundtrip_ms():
    """Dispatch + scalar-fetch round trip of a trivial program (~32 ms over
    the axon tunnel). Subtracted from every scan timing."""
    global _RT_MS
    if _RT_MS is None:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda e: e * 2.0 + 1.0)
        float(f(jnp.asarray(0.5, jnp.float32)))
        ts = []
        for k in range(3):
            t0 = time.perf_counter()
            float(f(jnp.asarray(0.1 * k, jnp.float32)))
            ts.append(time.perf_counter() - t0)
        _RT_MS = sorted(ts)[1] * 1e3
    return _RT_MS


def _scan_time(make_loop, x0, steps):
    """Time `steps` chained on-device iterations in ONE dispatch.

    Execution is forced by fetching a scalar reduction of the final carry —
    on the axon tunnel `block_until_ready` returns before the program has
    actually run, so only a value fetch is trustworthy. A fresh epsilon is
    folded into the input inside the program each call (defeats the remote
    execution-memoization cache, which keys on input values). The measured
    dispatch+fetch round trip is subtracted; if the program is too short to
    dominate the round trip, the iteration count is scaled up once."""
    import jax
    import jax.numpy as jnp

    def build(k):
        raw = make_loop(k)

        @jax.jit
        def loopj(x, eps):
            x = jax.tree.map(lambda a: (a + eps.astype(jnp.result_type(a, jnp.float32))
                                        .astype(a.dtype)), x)
            out = raw(x)
            return sum(jnp.sum(jnp.real(l)).astype(jnp.float32)
                       for l in jax.tree.leaves(out))
        return loopj

    rt = _roundtrip_ms()
    loopj = build(steps)
    float(loopj(x0, jnp.zeros((), jnp.float32)))          # compile + run
    t0 = time.perf_counter()
    float(loopj(x0, jnp.asarray(1e-4, jnp.float32)))
    total = (time.perf_counter() - t0) * 1e3
    if total < 8 * rt:                                    # amortize the tunnel
        scale = max(2, int(10 * rt / max(total - rt, 0.3)))
        steps *= scale
        loopj = build(steps)
        float(loopj(x0, jnp.zeros((), jnp.float32)))
        t0 = time.perf_counter()
        float(loopj(x0, jnp.asarray(2e-4, jnp.float32)))
        total = (time.perf_counter() - t0) * 1e3
    return max(total - rt, 1e-4) / steps


def _build_vqe(n, nlayer):
    import deepquantum_tpu as dq
    cir = dq.QubitCircuit(n)
    for _ in range(nlayer):
        for i in range(n):
            cir.rx(i)
            cir.rz(i)
            cir.rx(i)
        cir.cnot_ring()
    cir.observable(list(range(n)), basis='x' * n)
    return cir


# --------------------------------------------------------------------- qubit
def bench_gradient(grid=((2, 6, 10, 14, 18, 22), (1, 5, 10)), steps=20):
    """Reference grid: gradient_deepquantum.py:24-56 (n x layers)."""
    import jax
    import jax.numpy as jnp
    # rows are non-monotonic across the engine threshold (e.g. n6_l10 >
    # n10_l10): n >= 10 rides the planar Pallas kernel, below it the XLA
    # einsum path — tag the boundary so readers see a threshold, not a bug
    out = _merge_row('gradient_ms', '_engine', {
        'planar_from_n': 10,
        'note': 'rows with n >= planar_from_n run the planar '
                'Pallas engine; smaller n run the XLA einsum '
                'path (planar_supported, ops/planar_gate.py)'})
    for nlayer in grid[1]:
        for n in grid[0]:
            rk = f'n{n}_l{nlayer}'
            if _skip_cell(out.get(rk)):
                print(f'gradient {rk}: cached {out[rk]}')
                continue
            # no residual-memory cap needed: on TPU at n >= 12 the planar
            # chain VJP keeps O(1) state memory (ops/planar_gate.py)
            cir = _build_vqe(n, nlayer)
            grad_fn = jax.value_and_grad(lambda p: cir.expectation(params=p)[0])

            def make_loop(k):
                def loop(p):
                    def body(p, _):
                        _, g = grad_fn(p)
                        return p - 1e-3 * g, None
                    return jax.lax.scan(body, p, None, length=k)[0]
                return loop

            with _maybe_profile(f'gradient_n{n}_l{nlayer}'):
                ms = _scan_time(make_loop, cir.params, steps)
            out = _merge_row('gradient_ms', rk, ms)
            print(f'gradient n={n} l={nlayer}: {ms:.3f} ms/step')
    return out


def bench_shardmap_grad(ns=(18, 24), nlayer=2, steps=10):
    """Grad step through DistributedQubitCircuit(engine='shardmap') on the
    attached chip (mesh=1) vs the local planar path at the same workload —
    quantifies the distributed engine's overhead (chain VJP + exchange
    machinery) relative to the single-chip roofline path (VERDICT r3 item 4;
    reference training semantics: circuit.py:1706 + adjoint.py:43-83).
    The 8-CPU-mesh scaling shape lives in MULTICHIP_r*.json (driver dryrun)."""
    import jax
    from deepquantum_tpu.parallel.circuit import DistributedQubitCircuit
    from deepquantum_tpu.parallel.sharded import make_mesh
    out = dict(_recorded('shardmap_grad_ms'))
    for n in ns:
        for engine in ('shardmap', 'local'):
            rk = f'n{n}_l{nlayer}_{engine}'
            if _skip_cell(out.get(rk)):
                print(f'shardmap_grad {rk}: cached {out[rk]}')
                continue
            try:
                if engine == 'shardmap':
                    cir = DistributedQubitCircuit(n, mesh=make_mesh(1),
                                                  engine='shardmap')
                    for _ in range(nlayer):
                        for i in range(n):
                            cir.rx(i)
                            cir.rz(i)
                            cir.rx(i)
                        cir.cnot_ring()
                    cir.observable(list(range(n)), basis='x' * n)
                else:
                    cir = _build_vqe(n, nlayer)
                grad_fn = jax.value_and_grad(
                    lambda p: cir.expectation(params=p)[0])

                def make_loop(k):
                    def loop(p):
                        def body(p, _):
                            _, g = grad_fn(p)
                            return p - 1e-3 * g, None
                        return jax.lax.scan(body, p, None, length=k)[0]
                    return loop

                ms = _scan_time(make_loop, cir.params, steps)
                out = _merge_row('shardmap_grad_ms', rk, ms)
                print(f'shardmap_grad n={n} l={nlayer} [{engine}]: '
                      f'{ms:.3f} ms/step')
            except Exception as e:  # noqa: BLE001 — record partial grids
                print(f'shardmap_grad {rk}: failed '
                      f'({type(e).__name__}: {str(e)[:120]})')
                out = _merge_row('shardmap_grad_ms', rk, _FAILED)
    return out


def bench_gradient_adjoint(ns=(14, 18), nlayer=5, steps=5):
    """The complex lax.scan adjoint path (adjoint.py) — kept for the
    distributed API; at n >= 12 the planar chain VJP (ops/planar_gate.py)
    supersedes it (same O(1) memory, ~500x faster: 2.1 ms vs 1089 ms at
    n=14/l=5) and carries gradient_large to n=28. The sweep runs LAST in
    SECTIONS: the pre-sharding path once hard-crashed the remote worker at
    n > 14, so a repeat loses nothing already recorded."""
    import jax
    from deepquantum_tpu.adjoint import make_adjoint_expectation
    out = dict(_recorded('gradient_adjoint_ms'))
    for n in ns:
        rk = f'n{n}_l{nlayer}'
        if _skip_cell(out.get(rk)):
            print(f'gradient_adjoint {rk}: cached {out[rk]}')
            continue
        cir = _build_vqe(n, nlayer)
        try:
            t_build = time.perf_counter()
            exp_fn = make_adjoint_expectation(cir)
            grad_fn = jax.value_and_grad(exp_fn)

            def make_loop(k):
                def loop(p):
                    def body(p, _):
                        _, g = grad_fn(p)
                        return p - 1e-3 * g, None
                    return jax.lax.scan(body, p, None, length=k)[0]
                return loop

            with _maybe_profile(f'adjoint_n{n}_l{nlayer}'):
                ms = _scan_time(make_loop, cir.params, steps)
            out = _merge_row('gradient_adjoint_ms', rk, ms)
            print(f'gradient_adjoint n={n} l={nlayer}: {ms:.2f} ms/step '
                  f'(build+compile {time.perf_counter() - t_build:.1f}s)')
        except Exception as e:  # noqa: BLE001 — record partial sweeps
            print(f'gradient_adjoint n={n}: failed ({type(e).__name__}: {e})')
            out = _merge_row('gradient_adjoint_ms', rk, _FAILED)
            break
    return out


def bench_gradient_large(ns=(24, 26, 28), nlayer=2, steps=4):
    """Large-n single-chip VQE gradient steps through the planar engine.

    The chain-level adjoint VJP keeps O(1) state memory (no per-gate
    residuals), so a v5e's 16 GB HBM carries full gradient training to
    n=28 (2 GB planar state; peak ~3 live buffers in the backward) — the
    BASELINE.md 30-qubit-scale north star on ONE chip; beyond that the
    GSPMD/shard_map engines split the amplitude axis over the mesh."""
    import jax
    out = dict(_recorded('gradient_large_ms'))
    for n in ns:
        rk = f'n{n}_l{nlayer}'
        if _skip_cell(out.get(rk)):
            print(f'gradient_large {rk}: cached {out[rk]}')
            continue
        cir = _build_vqe(n, nlayer)
        grad_fn = jax.value_and_grad(lambda p: cir.expectation(params=p)[0])

        def make_loop(k):
            def loop(p):
                def body(p, _):
                    _, g = grad_fn(p)
                    return p - 1e-3 * g, None
                return jax.lax.scan(body, p, None, length=k)[0]
            return loop

        try:
            with _maybe_profile(f'gradient_large_n{n}'):
                ms = _scan_time(make_loop, cir.params, steps)
            out = _merge_row('gradient_large_ms', rk, ms)
            print(f'gradient_large n={n} l={nlayer}: {ms:.2f} ms/step')
        except Exception as e:  # noqa: BLE001
            print(f'gradient_large n={n}: failed ({type(e).__name__}: {str(e)[:120]})')
            out = _merge_row('gradient_large_ms', rk, _FAILED)
            break
    return out


def bench_fusion_ablation(n=22, nlayer=5, steps=10):
    """Measured effect of the greedy K-wire fusion on the grad step
    (round-1 review asked for the delta to be measured, not claimed).

    Pins DQ_WINDOW=0: this section ablates the PER-GATE planar kernel
    stream; with the MXU window engine on, gate runs collapse into dense
    windows and K stops being the variable under test."""
    import os

    import jax
    out = dict(_recorded('fusion_ablation_ms'))
    prev_w = os.environ.get('DQ_WINDOW')
    os.environ['DQ_WINDOW'] = '0'
    try:
        for K in (1, 2, 3):
            rk = f'K{K}'
            if _skip_cell(out.get(rk)):
                print(f'fusion {rk}: cached {out[rk]}')
                continue
            cir = _build_vqe(n, nlayer)
            cir.fuse_max_support = K
            grad_fn = jax.value_and_grad(lambda p: cir.expectation(params=p)[0])

            def make_loop(k):
                def loop(p):
                    def body(p, _):
                        _, g = grad_fn(p)
                        return p - 1e-3 * g, None
                    return jax.lax.scan(body, p, None, length=k)[0]
                return loop

            ms = _scan_time(make_loop, cir.params, steps)
            out = _merge_row('fusion_ablation_ms', rk, ms)
            print(f'fusion n={n} l={nlayer} K={K}: {ms:.2f} ms/step')
    finally:
        if prev_w is None:
            os.environ.pop('DQ_WINDOW', None)
        else:
            os.environ['DQ_WINDOW'] = prev_w
    return out


def bench_window_ablation(steps=10):
    """MXU window engine A/B (ops/window_gate.py): the same VQE grad step
    with DQ_WINDOW off (per-gate planar kernels + relabel scheduler) vs on
    (gate runs collapsed into dense 2^w unitaries, one matmul sweep each),
    plus a DQ_WINDOW_W width sweep at the headline workload (VERDICT r4
    item 1: which part of the headline the window engine buys, and whether
    w=7 — the v5e ridge point — is actually the right width).
    Grid matches the headline (n18_l5) and the large single-chip row
    (n24_l2). The window engine engages at n >= 14.

    DQ_CHAIN_FUSED is pinned OFF here so the cells isolate the PER-PASS
    window effect; the one-launch VMEM chain engine riding on top of the
    window schedule is measured separately (chain_ablation_ms)."""
    import os

    import jax
    out = dict(_recorded('window_ablation_ms'))
    prev_w = os.environ.get('DQ_WINDOW')
    prev_ww = os.environ.get('DQ_WINDOW_W')
    prev_cf = os.environ.get('DQ_CHAIN_FUSED')
    os.environ['DQ_CHAIN_FUSED'] = '0'

    def _time_cell(rk, n, nlayer):
        nonlocal out
        cir = _build_vqe(n, nlayer)
        grad_fn = jax.value_and_grad(lambda p: cir.expectation(params=p)[0])

        def make_loop(k):
            def loop(p):
                def body(p, _):
                    _, g = grad_fn(p)
                    return p - 1e-3 * g, None
                return jax.lax.scan(body, p, None, length=k)[0]
            return loop

        try:
            ms = _scan_time(make_loop, cir.params, steps)
        except Exception as e:  # noqa: BLE001 — record partial grids
            print(f'window {rk}: failed ({type(e).__name__}: {str(e)[:100]})')
            out = _merge_row('window_ablation_ms', rk, _FAILED)
            return None
        out = _merge_row('window_ablation_ms', rk, ms)
        return ms

    try:
        for n, nlayer in ((18, 5), (24, 2)):
            for win in (0, 1):
                rk = f'n{n}_l{nlayer}_win{win}'
                if _skip_cell(out.get(rk)):
                    print(f'window {rk}: cached {out[rk]}')
                    continue
                os.environ['DQ_WINDOW'] = str(win)
                os.environ.pop('DQ_WINDOW_W', None)
                ms = _time_cell(rk, n, nlayer)
                if ms is not None:
                    print(f'window n={n} l={nlayer} win={win}: '
                          f'{ms:.2f} ms/step')
        # width sweep at the headline workload, windows on
        os.environ['DQ_WINDOW'] = '1'
        for ww in (5, 6, 7, 8):
            rk = f'n18_l5_w{ww}'
            if _skip_cell(out.get(rk)):
                print(f'window {rk}: cached {out[rk]}')
                continue
            os.environ['DQ_WINDOW_W'] = str(ww)
            ms = _time_cell(rk, 18, 5)
            if ms is not None:
                print(f'window n=18 l=5 w={ww}: {ms:.2f} ms/step')
    finally:
        for var, prev in (('DQ_WINDOW', prev_w), ('DQ_WINDOW_W', prev_ww),
                          ('DQ_CHAIN_FUSED', prev_cf)):
            if prev is None:
                os.environ.pop(var, None)
            else:
                os.environ[var] = prev
    return out


def bench_chain_ablation(steps=10):
    """One-launch VMEM chain engine A/B (ops/chain_kernel.py): the same VQE
    grad step with DQ_CHAIN_FUSED off (one Pallas launch per window/rot
    pass — one full HBM round trip each) vs on (the whole scheduled window
    sequence as ONE launch per direction, state held in VMEM throughout).

    Motivation measured in window_ablation_ms: collapsing 224 per-gate
    passes into 86 window/rot passes moved the n18_l5 headline NOT AT ALL
    (5.21 -> 5.36 ms) — per-pass HBM round trips, not pass count, were the
    bound. The chain engine removes the round trips themselves. Engages at
    14 <= n <= 19 (state + stacked windows must fit VMEM)."""
    import os

    import jax
    out = dict(_recorded('chain_ablation_ms'))
    prev_cf = os.environ.get('DQ_CHAIN_FUSED')
    try:
        for n, nlayer in ((16, 5), (18, 5)):
            for cf in (0, 1):
                rk = f'n{n}_l{nlayer}_chain{cf}'
                if _skip_cell(out.get(rk)):
                    print(f'chain {rk}: cached {out[rk]}')
                    continue
                os.environ['DQ_CHAIN_FUSED'] = str(cf)
                cir = _build_vqe(n, nlayer)
                grad_fn = jax.value_and_grad(
                    lambda p: cir.expectation(params=p)[0])

                def make_loop(k):
                    def loop(p):
                        def body(p, _):
                            _, g = grad_fn(p)
                            return p - 1e-3 * g, None
                        return jax.lax.scan(body, p, None, length=k)[0]
                    return loop

                try:
                    ms = _scan_time(make_loop, cir.params, steps)
                except Exception as e:  # noqa: BLE001
                    print(f'chain {rk}: failed ({type(e).__name__}: '
                          f'{str(e)[:100]})')
                    out = _merge_row('chain_ablation_ms', rk, _FAILED)
                    continue
                out = _merge_row('chain_ablation_ms', rk, ms)
                print(f'chain n={n} l={nlayer} chain={cf}: {ms:.3f} ms/step')
    finally:
        if prev_cf is None:
            os.environ.pop('DQ_CHAIN_FUSED', None)
        else:
            os.environ['DQ_CHAIN_FUSED'] = prev_cf
    return out


def bench_fusion_window(n=22, nlayer=5, steps=10):
    """K-wire fusion sweep with the MXU window engine ON — the shipped
    default. fusion_ablation_ms (windows pinned OFF) showed K3 48.4 > K2
    40.3 ms; this section decides the K=3 story with data under the real
    configuration (VERDICT r4 item 5): either the window engine makes K
    irrelevant (gate runs collapse into dense windows regardless), or K2
    stays best and the K3 claim dies."""
    import os

    import jax
    out = dict(_recorded('fusion_window_ablation_ms'))
    prev_w = os.environ.get('DQ_WINDOW')
    os.environ['DQ_WINDOW'] = '1'
    try:
        for K in (1, 2, 3):
            rk = f'K{K}'
            if _skip_cell(out.get(rk)):
                print(f'fusion_window {rk}: cached {out[rk]}')
                continue
            cir = _build_vqe(n, nlayer)
            cir.fuse_max_support = K
            grad_fn = jax.value_and_grad(lambda p: cir.expectation(params=p)[0])

            def make_loop(k):
                def loop(p):
                    def body(p, _):
                        _, g = grad_fn(p)
                        return p - 1e-3 * g, None
                    return jax.lax.scan(body, p, None, length=k)[0]
                return loop

            try:
                ms = _scan_time(make_loop, cir.params, steps)
            except Exception as e:  # noqa: BLE001
                print(f'fusion_window {rk}: failed ({type(e).__name__}: '
                      f'{str(e)[:100]})')
                out = _merge_row('fusion_window_ablation_ms', rk, _FAILED)
                continue
            out = _merge_row('fusion_window_ablation_ms', rk, ms)
            print(f'fusion_window n={n} l={nlayer} K={K}: {ms:.2f} ms/step')
    finally:
        if prev_w is None:
            os.environ.pop('DQ_WINDOW', None)
        else:
            os.environ['DQ_WINDOW'] = prev_w
    return out


def bench_grad_mxu_ablation(n=22, nlayer=5, steps=10, acc_n=16):
    """Planar backward-kernel ablation grid: VPU scalar-store vs MXU
    dot_general cotangent reduction (DQ_GRAD_MXU) x 3-launch vs fused
    single-launch backward (DQ_FUSED_BWD, 6 -> 4 HBM units per gate) x
    fusion K in {2, 3}, plus a recorded on-chip gradient parity row
    (VERDICT r2 item 6).

    One full grid does not fit a single 580 s process on the tunneled chip
    (8 compiles of a deep planar chain), so the grid is resumable:
    DQ_BENCH_CONFIGS="00,01" runs only (fused,mxu) pairs listed (parity row
    runs only when "parity" is listed or the filter is unset), and the
    section merges into any previously recorded rows instead of replacing
    them."""
    import os

    import jax
    import jax.numpy as jnp
    cfg_filter = os.environ.get('DQ_BENCH_CONFIGS', '')
    pairs = [(int(c[0]), int(c[1])) for c in cfg_filter.split(',')
             if len(c) == 2 and c.isdigit()] if cfg_filter else \
        [(f, m) for f in (0, 1) for m in (0, 1)]
    do_parity = (not cfg_filter) or ('parity' in cfg_filter)
    out = {}
    path = os.path.join(_HERE, 'results.json')
    if os.path.exists(path):
        with open(path) as f:
            out.update(json.load(f).get('grad_mxu_ablation_ms') or {})
    prev = os.environ.get('DQ_GRAD_MXU')
    prev_f = os.environ.get('DQ_FUSED_BWD')
    prev_w = os.environ.get('DQ_WINDOW')
    # this grid ablates the PER-GATE backward kernels; the MXU window engine
    # would collapse the gate stream and mask the variables under test
    os.environ['DQ_WINDOW'] = '0'

    def _flush():
        # each cell is a multi-minute compile on the tunneled chip and the
        # 580 s process cap can land mid-grid — persist after every cell,
        # atomically (a cap landing mid-write must not truncate the JSON)
        merged = {}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        merged['grad_mxu_ablation_ms'] = out
        _atomic_dump(merged, path)

    try:
        for fused, mxu in pairs:
            os.environ['DQ_FUSED_BWD'] = str(fused)
            if True:
                os.environ['DQ_GRAD_MXU'] = str(mxu)
                for K in (2, 3):
                    if _skip_cell(out.get(f'fused{fused}_mxu{mxu}_K{K}')):
                        print(f'grad kernel fused={fused} mxu={mxu} K={K}: '
                              f'cached {out[f"fused{fused}_mxu{mxu}_K{K}"]}')
                        continue
                    cir = _build_vqe(n, nlayer)
                    cir.fuse_max_support = K
                    grad_fn = jax.value_and_grad(lambda p: cir.expectation(params=p)[0])

                    def make_loop(k):
                        def loop(p):
                            def body(p, _):
                                _, g = grad_fn(p)
                                return p - 1e-3 * g, None
                            return jax.lax.scan(body, p, None, length=k)[0]
                        return loop

                    try:
                        ms = _scan_time(make_loop, cir.params, steps)
                    except Exception as e:  # noqa: BLE001 — record partial grids
                        print(f'grad kernel fused={fused} mxu={mxu} K={K}: failed '
                              f'({type(e).__name__}: {str(e)[:100]})')
                        out[f'fused{fused}_mxu{mxu}_K{K}'] = _FAILED
                        _flush()
                        continue
                    out[f'fused{fused}_mxu{mxu}_K{K}'] = ms
                    print(f'grad kernel fused={fused} mxu={mxu} K={K}: {ms:.2f} ms/step')
                    _flush()
        os.environ['DQ_FUSED_BWD'] = '0'

        if do_parity and out.get('grad_parity_max_rel') is not None:
            # advisor r3: say the value is cached, and recompute when 'parity'
            # is explicitly requested (gradient-kernel changes stale it)
            if 'parity' in cfg_filter:
                out.pop('grad_parity_max_rel')
            else:
                print(f'grad kernel parity: cached {out["grad_parity_max_rel"]:.2e} '
                      '(set DQ_BENCH_CONFIGS=parity to force recompute)')
        if do_parity and out.get('grad_parity_max_rel') is None:
            # on-chip gradient parity between the two kernel formulations —
            # same parameter point for both (param init is random per build)
            grads = {}
            p0 = None
            for mxu in (0, 1):
                os.environ['DQ_GRAD_MXU'] = str(mxu)
                cir = _build_vqe(acc_n, 2)
                if p0 is None:
                    p0 = cir.params
                g = jax.jit(jax.grad(lambda p: cir.expectation(params=p)[0]))(p0)
                grads[mxu] = np.asarray(jnp.asarray(g, jnp.float32))
            denom = max(float(np.abs(grads[0]).max()), 1e-12)
            out['grad_parity_max_rel'] = (float(np.abs(grads[1] - grads[0]).max())
                                          / denom)
            print(f'grad kernel parity (n={acc_n}): max rel diff = '
                  f'{out["grad_parity_max_rel"]:.2e}')
            _flush()
    finally:
        if prev is None:
            os.environ.pop('DQ_GRAD_MXU', None)
        else:
            os.environ['DQ_GRAD_MXU'] = prev
        if prev_f is None:
            os.environ.pop('DQ_FUSED_BWD', None)
        else:
            os.environ['DQ_FUSED_BWD'] = prev_f
        if prev_w is None:
            os.environ.pop('DQ_WINDOW', None)
        else:
            os.environ['DQ_WINDOW'] = prev_w
    return out


def bench_batched_qml(n=14, nlayer=2, batch=100, steps=5):
    """Batched data re-uploading QML grad step (the reference's core vmap
    use case, circuit.py:232-240): the batch rides the planar kernel as a
    GRID axis vs the complex-engine vmap fallback (VERDICT r2 weak #6 asked
    for this recorded at B=100)."""
    import os

    import jax
    import jax.numpy as jnp
    import deepquantum_tpu as dq

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.random((batch, n)), jnp.float32)

    def build():
        # reupload: the circuit has nlayer*n encoders but each sample carries
        # n features — the reference wraps the data around the encoder list
        # (reference circuit.py:287-293), and so do we (VERDICT r4 weak #1)
        cir = dq.QubitCircuit(n, reupload=True)
        for _ in range(nlayer):
            for i in range(n):
                cir.ry(i, encode=True)
            for i in range(n):
                cir.rz(i)
                cir.ry(i)
            cir.cnot_ring()
        cir.observable(0)
        return cir

    out = dict(_recorded('batched_qml_grad_ms'))
    prev = os.environ.get('DQ_PLANAR')
    try:
        for planar in (1, 0):
            rk = f'planar{planar}'
            if _skip_cell(out.get(rk)):
                print(f'batched_qml {rk}: cached {out[rk]}')
                continue
            os.environ['DQ_PLANAR'] = str(planar)
            cir = build()
            grad_fn = jax.value_and_grad(
                lambda p: jnp.sum(cir.expectation(data=data, params=p)))

            def make_loop(k):
                def loop(p):
                    def body(p, _):
                        _, g = grad_fn(p)
                        return p - 1e-3 * g, None
                    return jax.lax.scan(body, p, None, length=k)[0]
                return loop

            try:
                ms = _scan_time(make_loop, cir.params, steps)
            except Exception as e:  # noqa: BLE001
                print(f'batched_qml planar={planar}: failed '
                      f'({type(e).__name__}: {str(e)[:100]})')
                out = _merge_row('batched_qml_grad_ms', rk, _FAILED)
                continue
            out = _merge_row('batched_qml_grad_ms', rk, ms)
            print(f'batched_qml n={n} l={nlayer} B={batch} planar={planar}: '
                  f'{ms:.2f} ms/step')
    finally:
        if prev is None:
            os.environ.pop('DQ_PLANAR', None)
        else:
            os.environ['DQ_PLANAR'] = prev
    return out


def bench_denmat(n=12, nlayer=3, steps=5):
    """Noisy-QML density-matrix grad step (rho = 4^n amplitudes): the planar
    2n-qubit route (circuit.py::_sim_planar_dm) vs the den-mat einsum
    engine. One depolarizing channel per layer flushes the planar chain."""
    import os

    import jax
    import deepquantum_tpu as dq

    def build():
        cir = dq.QubitCircuit(n, den_mat=True)
        for _ in range(nlayer):
            for i in range(n):
                cir.rx(i)
                cir.rz(i)
            cir.cnot_ring()
            cir.depolarizing(0, inputs=0.01)
        cir.observable(list(range(n)), basis='x' * n)
        return cir

    out = dict(_recorded('denmat_grad_ms'))
    prev = os.environ.get('DQ_PLANAR')
    try:
        for planar in (1, 0):
            rk = f'planar{planar}'
            if _skip_cell(out.get(rk)):
                print(f'denmat {rk}: cached {out[rk]}')
                continue
            os.environ['DQ_PLANAR'] = str(planar)
            cir = build()
            grad_fn = jax.value_and_grad(lambda p: cir.expectation(params=p)[0])

            def make_loop(k):
                def loop(p):
                    def body(p, _):
                        _, g = grad_fn(p)
                        return p - 1e-3 * g, None
                    return jax.lax.scan(body, p, None, length=k)[0]
                return loop

            try:
                ms = _scan_time(make_loop, cir.params, steps)
            except Exception as e:  # noqa: BLE001
                print(f'denmat planar={planar}: failed ({type(e).__name__}: '
                      f'{str(e)[:100]})')
                out = _merge_row('denmat_grad_ms', rk, _FAILED)
                continue
            out = _merge_row('denmat_grad_ms', rk, ms)
            print(f'denmat n={n} l={nlayer} planar={planar}: {ms:.2f} ms/step')
    finally:
        if prev is None:
            os.environ.pop('DQ_PLANAR', None)
        else:
            os.environ['DQ_PLANAR'] = prev
    return out


def bench_hessian(grid=((2, 6, 10, 14, 18), (1, 5, 10)), steps=3):
    """Reference hessian_deepquantum.py: full Hessian of the expectation on
    the reference's n x layer grid (3*n*l parameters per cell).

    Computed with QubitCircuit.hessian — reverse-over-reverse HVP columns
    under lax.map, so ONE hvp body compiles regardless of the parameter
    count and every pass rides the planar/window kernels. jax.hessian
    (jacfwd . jacrev) cannot cross the planar chain's custom_vjp and its
    einsum fallback's COMPILE time grows superlinearly with the parameter
    count (~30 s at 24 params, unusable at 540) — that is what the
    round-3 'failed' cells at n >= 10 were."""
    import jax
    out = dict(_recorded('hessian_ms'))
    for nlayer in grid[1]:
        for n in grid[0]:
            rk = f'n{n}_l{nlayer}'
            if _skip_cell(out.get(rk)):
                print(f'hessian {rk}: cached {out[rk]}')
                continue
            cir = _build_vqe(n, nlayer)

            def make_loop(k):
                def loop(p):
                    def body(p, _):
                        h = cir.hessian(params=p)
                        return p + 1e-6 * jax.numpy.diagonal(h), None
                    return jax.lax.scan(body, p, None, length=k)[0]
                return loop

            try:
                with _maybe_profile(f'hessian_n{n}_l{nlayer}'):
                    ms = _scan_time(make_loop, cir.params, steps)
            except Exception as e:  # noqa: BLE001
                print(f'hessian n={n} l={nlayer}: failed ({type(e).__name__})')
                out = _merge_row('hessian_ms', rk, _FAILED)
                continue
            out = _merge_row('hessian_ms', rk, ms)
            print(f'hessian n={n} l={nlayer}: {ms:.2f} ms')
    return out


def bench_gate_apply_roofline(ns=(24, 26), ngate=64):
    """Fused 3-qubit group apply through the planar Pallas engine: ms/gate
    and achieved HBM GB/s vs the v5e peak (819 GB/s). One pass moves
    2 x 8 x 2^n bytes (read + write of both f32 planes). The one
    scan-boundary donation copy is amortized over `ngate` chained gates
    (real circuits chain hundreds). Practical stream ceiling measured by
    benchmarks/calibrate_hbm.py: ~593-676 GB/s."""
    import jax
    import jax.numpy as jnp
    from deepquantum_tpu.ops.planar_gate import planar_evolve
    rng = np.random.default_rng(0)
    z = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    u = np.linalg.qr(z)[0]
    mre = jnp.asarray(np.real(u).astype(np.float32))
    mim = jnp.asarray(np.imag(u).astype(np.float32))
    out = {}
    for n in ns:
        try:
            # 16 gates per scan body: the scan-boundary reshape costs one
            # donation copy per iteration, so enough gates must amortize it
            # (real circuit forwards chain hundreds inside one trace)
            wsets = [(0, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11)] * 4

            def make_loop(k):
                def loop(x):
                    def body(x, _):
                        for ws in wsets:
                            x = planar_evolve(x, mre, mim, n, ws)
                        return x, None
                    return jax.lax.scan(body, x, None, length=k // len(wsets))[0]
                return loop

            # bare chain: carry the scan state in the kernel's BLOCKED layout
            # (same wires every gate), so the scan boundary needs no reshape
            # and the donation chain stays intact — this is the rate the
            # kernel itself sustains. lax.reshape to an identical shape is a
            # no-op, so _planar_apply's internal view costs nothing here.
            from deepquantum_tpu.ops.planar_gate import _geometry
            _, _, _, bshape, _, _ = _geometry(n, [0, 1, 2])

            def make_bare(k):
                def loop(xb):
                    def body(xb, _):
                        for _ in range(len(wsets)):
                            xb = planar_evolve(xb, mre, mim, n, (0, 1, 2))
                        return xb, None
                    return jax.lax.scan(body, xb, None, length=k // len(wsets))[0]
                return loop

            # scheduled chain: the SAME drifting-wire gate stream through
            # schedule_planar_seq + planar_chain — records how far the
            # wire-relabel scheduler closes the scan-vs-bare gap on gate
            # streams whose wires leave the head region (the real-circuit
            # case; the (9,10,11) group has 2 mid wires at n=24)
            from deepquantum_tpu.ops.planar_gate import (planar_chain,
                                                         schedule_planar_seq)
            mres0 = tuple(mre for _ in wsets)
            mims0 = tuple(mim for _ in wsets)
            smres, smims, swseq = schedule_planar_seq(mres0, mims0,
                                                      tuple(wsets), n)

            def make_sched(k):
                def loop(x):
                    def body(x, _):
                        return planar_chain(x, smres, smims, n, swseq), None
                    return jax.lax.scan(body, x, None, length=k // len(wsets))[0]
                return loop

            # make_loop(k) applies k gates total (k/4 scan steps x 4 gates),
            # so _scan_time's per-step division already yields ms per gate
            x0 = jnp.linspace(0, 1, 2 << n, dtype=jnp.float32).reshape(2, 1 << n)
            ms = _scan_time(make_loop, x0, ngate)
            ms_bare = _scan_time(make_bare, x0.reshape(bshape), ngate)
            ms_sched = _scan_time(make_sched, x0, ngate)
            bytes_moved = 2 * 8 * (1 << n)
            row = {}
            for tag, m in (('scan', ms), ('bare', ms_bare), ('sched', ms_sched)):
                gbps = bytes_moved / (m * 1e-3) / 1e9
                row[f'ms_per_gate_{tag}'] = m
                row[f'achieved_gbps_{tag}'] = gbps
                # fraction of the MEASURED c64-stream ceiling (calibrate_hbm
                # 644-653 GB/s on the attached v5e), not the paper 819 —
                # see hbm_calibration_gbps in results.json
                row[f'frac_of_c64_ceiling_{tag}'] = gbps / 645.0
                print(f'gate_apply[{tag}] n={n}: {m:.3f} ms/gate-group, '
                      f'{gbps:.0f} GB/s ({100 * gbps / 645:.0f}% of measured '
                      f'c64 stream ceiling)')
            out[f'n{n}'] = row
        except Exception as e:  # noqa: BLE001
            print(f'gate_apply n={n}: failed ({type(e).__name__})')
            break
    return out


# ------------------------------------------------------------------ photonic
def _permanent_host_f64(a: np.ndarray, chunk: int = 1 << 16) -> complex:
    """Host numpy complex128 Ryser permanent — the parity oracle for the
    on-chip df32 kernel (chunked so n=22 never materializes 2^n x n)."""
    n = a.shape[0]
    total = 0.0 + 0.0j
    for start in range(0, 1 << n, chunk):
        idx = np.arange(start, min(start + chunk, 1 << n), dtype=np.int64)
        masks = ((idx[:, None] >> np.arange(n)) & 1).astype(np.complex128)
        sums = masks @ a                       # (chunk, n) column sums over S
        par = np.where(np.bitwise_count(idx.astype(np.uint64)) % 2 == 0, 1.0, -1.0)
        total += np.sum(par * np.prod(sums, axis=1))
    return complex(total * (1 if n % 2 == 0 else -1))


def bench_permanent(ns=(10, 14, 18, 20, 22), steps=5, batch=4,
                    sweep_n=14, sweep_batches=(1, 10, 100, 1000)):
    """df32 Pallas kernel (TPU default path), batched grid launch. Records
    both latency and on-chip relative error vs the host f64 Ryser oracle
    (the round-1 review required a recorded on-chip parity run)."""
    import jax
    import jax.numpy as jnp
    from deepquantum_tpu.photonic.qmath import permanent_batch
    from deepquantum_tpu.utils.compat import to_device, to_numpy
    rng = np.random.default_rng(0)
    out = {}
    for n in ns:
        def haar(seed):
            z = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
            q, r = np.linalg.qr(z)
            return q * (np.diag(r) / np.abs(np.diag(r)))
        host_mats = np.stack([haar(s) for s in range(batch)])
        mats = to_device(host_mats.astype(np.complex64))

        vals = np.asarray(to_numpy(jax.jit(permanent_batch)(mats)))
        oracle = [_permanent_host_f64(m) for m in host_mats]
        rel = max(abs(complex(v) - o) / abs(o) for v, o in zip(vals, oracle))

        def make_loop(k):
            def loop(ms_):
                def body(m, _):
                    v = permanent_batch(m)
                    scale = (1 + 1e-9 * jnp.real(v) / (jnp.abs(v) + 1)).astype(m.dtype)
                    return m * scale[:, None, None], None
                return jax.lax.scan(body, ms_, None, length=k)[0]
            return loop

        with _maybe_profile(f'permanent_n{n}'):
            ms = _scan_time(make_loop, mats, steps) / batch
        out[f'n{n}'] = dict(ms=ms, rel_err_vs_f64=rel)
        print(f'permanent n={n}: {ms:.3f} ms/permanent (batch {batch}), '
              f'rel err vs f64 = {rel:.2e}')

    # reference sweep shape: batch in {1, 10, 100, 1000} at fixed nmode
    # (examples/benchmarks/benchmark_v420/permanent/permanent_deepquantum.py)
    n = sweep_n
    sweep = {}
    for b in sweep_batches:
        z = rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n))
        q = np.linalg.qr(z)[0]
        mats = to_device(q.astype(np.complex64))
        ms = _scan_time(make_loop, mats, steps)
        sweep[f'B{b}'] = dict(total_ms=ms, ms_per_permanent=ms / b)
        print(f'permanent n={n} batch={b}: {ms:.3f} ms total, '
              f'{ms / b:.4f} ms/permanent')
    out[f'batch_sweep_n{n}'] = sweep
    return out


def _hafnian_host_f64(a: np.ndarray, loop: bool = False) -> complex:
    """Host f64 power-trace (loop) hafnian (same published recurrence as
    photonic/hafnian_.py, numpy complex128) — the on-chip accuracy oracle."""
    n = a.shape[0]
    m = n // 2
    total = 0.0 + 0.0j
    import itertools as it
    for r in range(1, m + 1):
        for sub in it.combinations(range(m), r):
            idx = np.array([(2 * p, 2 * p + 1) for p in sub]).reshape(-1)
            az = a[np.ix_(idx, idx)]
            xaz = np.copy(az)
            xaz[0::2], xaz[1::2] = az[1::2], az[0::2]
            if loop:
                v = np.diagonal(az)
                xv = np.copy(v)
                xv[0::2], xv[1::2] = v[1::2], v[0::2]
                xv = xv / 2
                u = v
            p = np.zeros(m, np.complex128)
            mat = np.eye(2 * r, dtype=np.complex128)
            for j in range(1, m + 1):
                mat = mat @ xaz
                p[j - 1] = np.trace(mat) / (2 * j)
                if loop:
                    p[j - 1] += u @ xv
                    u = u @ xaz
            e = np.zeros(m + 1, np.complex128)
            e[0] = 1
            for k in range(1, m + 1):
                e[k] = sum(j * p[j - 1] * e[k - j] for j in range(1, k + 1)) / k
            total += (-1.0) ** (m - r) * e[m]
    return complex(total)


def bench_hafnian(ns=(8, 12, 16), steps=5):
    import jax
    import jax.numpy as jnp
    from deepquantum_tpu.photonic.hafnian_ import hafnian
    from deepquantum_tpu.utils.compat import to_device, to_numpy
    rng = np.random.default_rng(1)
    out = {}
    for n in ns:
        a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        host = (a + a.T).astype(np.complex64)
        m = to_device(host)
        val = complex(np.asarray(to_numpy(jax.jit(hafnian)(m))))
        oracle = _hafnian_host_f64(host.astype(np.complex128))
        rel = abs(val - oracle) / abs(oracle)

        def make_loop(k):
            def loop(x):
                def body(x, _):
                    v = hafnian(x)
                    return x * (1 + 1e-9 * jnp.real(v) / (jnp.abs(v) + 1)).astype(x.dtype), None
                return jax.lax.scan(body, x, None, length=k)[0]
            return loop

        with _maybe_profile(f'hafnian_n{n}'):
            ms = _scan_time(make_loop, m, steps)
        out[f'n{n}'] = dict(ms=ms, rel_err_vs_f64=rel)
        print(f'hafnian n={n}: {ms:.3f} ms, rel err vs f64 = {rel:.2e}')

        # loop (displaced-state) hafnian — same df32 path, diagonal terms on
        lval = complex(np.asarray(to_numpy(jax.jit(
            lambda z: hafnian(z, loop=True))(m))))
        lorac = _hafnian_host_f64(host.astype(np.complex128), loop=True)
        lrel = abs(lval - lorac) / abs(lorac)

        def make_loop_l(k):
            def loop(x):
                def body(x, _):
                    v = hafnian(x, loop=True)
                    return x * (1 + 1e-9 * jnp.real(v) / (jnp.abs(v) + 1)).astype(x.dtype), None
                return jax.lax.scan(body, x, None, length=k)[0]
            return loop

        lms = _scan_time(make_loop_l, m, steps)
        out[f'loop_n{n}'] = dict(ms=lms, rel_err_vs_f64=lrel)
        print(f'loop hafnian n={n}: {lms:.3f} ms, rel err vs f64 = {lrel:.2e}')

    # batched throughput at fixed n (reference hafnian_deepquantum_batch.py)
    from deepquantum_tpu.photonic.hafnian_ import hafnian_batch
    n, B = 12, 100
    zs = rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
    hosts = (zs + np.swapaxes(zs, 1, 2)).astype(np.complex64)
    mats = to_device(hosts)

    def make_loop_b(k):
        def loop(x):
            def body(x, _):
                v = hafnian_batch(x)
                scale = (1 + 1e-9 * jnp.real(v) / (jnp.abs(v) + 1)).astype(x.dtype)
                return x * scale[:, None, None], None
            return jax.lax.scan(body, x, None, length=k)[0]
        return loop

    bms = _scan_time(make_loop_b, mats, steps)
    out[f'batch{B}_n{n}'] = dict(total_ms=bms, ms_per_hafnian=bms / B)
    print(f'hafnian batch={B} n={n}: {bms:.3f} ms total, {bms / B:.4f} ms each')
    return out


def _torontonian_host_f64(o: np.ndarray, with_amp: bool = False):
    """Host complex128 torontonian (same subset det+solve formula as
    photonic/torontonian_.py) — the on-chip accuracy oracle. With
    ``with_amp`` also returns the cancellation amplification (largest
    term / |result|), the intrinsic conditioning of the instance."""
    import itertools as it
    o = o.astype(np.complex128)
    m = o.shape[-1] // 2
    total = (-1.0) ** m + 0j
    biggest = 1.0
    for r in range(1, m + 1):
        for sub in it.combinations(range(m), r):
            idx = np.sort(np.concatenate([np.array(sub), np.array(sub) + m]))
            cov_q_inv = np.eye(2 * r) - o[np.ix_(idx, idx)]
            term = (-1.0) ** (m - r) / np.sqrt(np.linalg.det(cov_q_inv))
            biggest = max(biggest, abs(term))
            total += term
    if with_amp:
        return complex(total), biggest / abs(total)
    return complex(total)


def _loop_torontonian_host_f64(o: np.ndarray, gamma: np.ndarray) -> complex:
    """Host complex128 loop (displaced) torontonian — same subset formula
    as photonic/torontonian_.py::_tor_helper."""
    import itertools as it
    o = o.astype(np.complex128)
    gamma = gamma.astype(np.complex128)
    m = o.shape[-1] // 2
    total = (-1.0) ** m + 0j
    for r in range(1, m + 1):
        for sub in it.combinations(range(m), r):
            idx = np.sort(np.concatenate([np.array(sub), np.array(sub) + m]))
            cov_q_inv = np.eye(2 * r) - o[np.ix_(idx, idx)]
            g = gamma[idx]
            e = g @ np.linalg.solve(cov_q_inv, np.conj(g)) / 2
            total += ((-1.0) ** (m - r) * np.exp(e)
                      / np.sqrt(np.linalg.det(cov_q_inv)))
    return complex(total)


def bench_torontonian(ns=(6, 8, 10, 12), steps=5):
    """n12 added round 5: the lane-major Pallas LU kernel (tor_kernel.py)
    replaced the jnp Gauss-Jordan whose edge over the reference collapsed
    with n (VERDICT r4 weak #6); rows resume per-cell now."""
    import jax
    import jax.numpy as jnp
    from deepquantum_tpu.photonic.torontonian_ import torontonian
    from deepquantum_tpu.utils.compat import to_device, to_numpy
    rng = np.random.default_rng(2)
    out = dict(_recorded('torontonian_ms'))
    for n in ns:
        m = rng.standard_normal((2 * n, 2 * n)) * 0.1
        # quantize to c64 FIRST and feed the oracle the quantized matrix
        # (same convention as bench_hafnian): the row measures COMPUTATION
        # error; input rounding is the caller's data precision, and the
        # inclusion-exclusion amplification (recorded) would otherwise
        # swamp the row with it.
        o = (np.eye(2 * n) - np.linalg.inv(np.eye(2 * n) + (m @ m.T))
             ).astype(np.complex64).astype(np.complex128)
        gam = (rng.standard_normal(2 * n) * 0.1).astype(np.complex64).astype(np.complex128)
        gam[n:] = np.conj(gam[:n])
        if not (_skip_cell(out.get(f'n{n}')) and _skip_cell(out.get(f'loop_n{n}'))):
            x = to_device(o.astype(np.complex64))
        if not _skip_cell(out.get(f'n{n}')):
            val = complex(np.asarray(to_numpy(jax.jit(torontonian)(x))))
            oracle, amp = _torontonian_host_f64(o, with_amp=True)
            rel = abs(val - oracle) / abs(oracle)

            def make_loop(k):
                def loop(z):
                    def body(z, _):
                        v = torontonian(z)
                        return z * (1 + 1e-9 * jnp.real(v) / (jnp.abs(v) + 1)).astype(z.dtype), None
                    return jax.lax.scan(body, z, None, length=k)[0]
                return loop

            with _maybe_profile(f'torontonian_n{n}'):
                ms = _scan_time(make_loop, x, steps)
            row = dict(ms=ms, rel_err_vs_f64=rel, cancellation_amp=amp)
            out = _merge_row('torontonian_ms', f'n{n}', row)
            print(f'torontonian 2n={2 * n}: {ms:.3f} ms, rel err vs f64 = '
                  f'{rel:.2e} (instance cancellation amp {amp:.1e})')
        else:
            print(f'torontonian n{n}: cached')

        # loop (displaced) variant — reference loop_torontonian benchmark dir
        if _skip_cell(out.get(f'loop_n{n}')):
            print(f'torontonian loop_n{n}: cached')
            continue
        gdev = to_device(gam.astype(np.complex64))
        lval = complex(np.asarray(to_numpy(jax.jit(torontonian)(x, gdev))))
        loracle = _loop_torontonian_host_f64(o, gam)
        lrel = abs(lval - loracle) / abs(loracle)

        def make_loop_l(k):
            # gamma rides the carry: a closed-over complex device array would
            # be embedded as a jit CONSTANT, and constant embedding fetches
            # the value host-side — a complex d2h transfer the axon tunnel
            # does not implement (utils/compat.py)
            def loop(carry):
                def body(carry, _):
                    z, g = carry
                    v = torontonian(z, g)
                    scale = (1 + 1e-9 * jnp.real(v) / (jnp.abs(v) + 1)).astype(z.dtype)
                    return (z * scale, g), None
                return jax.lax.scan(body, carry, None, length=k)[0]
            return loop

        lms = _scan_time(make_loop_l, (x, gdev), steps)
        out = _merge_row('torontonian_ms', f'loop_n{n}',
                         dict(ms=lms, rel_err_vs_f64=lrel))
        print(f'loop torontonian 2n={2 * n}: {lms:.3f} ms, rel err vs f64 = '
              f'{lrel:.2e}')
    return out


# ---------------------------------------------------------------------- MBQC
def _mbqc_circuit_specs(ns=(3, 5, 7), reps=3):
    """The exact random-circuit op lists bench_mbqc times, as data — so the
    reference comparator (bench_reference_mbqc) runs the SAME circuits."""
    rng = np.random.default_rng(3)
    specs = {}
    for n in ns:
        per_rep = []
        for _ in range(reps):
            ops = []
            for _ in range(2 * n):
                k = int(rng.integers(3))
                w = int(rng.integers(n))
                if k == 0:
                    ops.append(('h', w))
                elif k == 1:
                    ops.append(('rx', w, float(rng.uniform(0, np.pi))))
                else:
                    ops.append(('cnot', w, (w + 1) % n))
            per_rep.append(ops)
        specs[n] = per_rep
    return specs


def _mbqc_build(cir, ops):
    for op in ops:
        if op[0] == 'h':
            cir.h(op[1])
        elif op[0] == 'rx':
            cir.rx(op[1], inputs=op[2])
        else:
            cir.cnot(op[1], op[2])
    return cir


def bench_mbqc(ns=(3, 5, 7), reps=3):
    """Transpile + simulate latency on random circuits (reference
    MBQC_simulate/simulate_dq.py, MBQC_transpile/transpile_dq.py).
    Host-driven (pattern execution is host orchestration by design)."""
    import deepquantum_tpu as dq
    specs = _mbqc_circuit_specs(ns, reps)
    out = {}
    # exclude first-call compile from every row (round-2 review: the n=3
    # row recorded 52 ms of warmup against 0.4 ms steady-state)
    warm = dq.QubitCircuit(2)
    warm.h(0)
    warm.cnot(0, 1)
    warm.pattern()()
    for n in ns:
        t_t, t_s = [], []
        for ops in specs[n]:
            cir = _mbqc_build(dq.QubitCircuit(n), ops)
            t0 = time.perf_counter()
            pat = cir.pattern()
            t_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            pat()
            t_s.append(time.perf_counter() - t0)
        out[f'n{n}'] = dict(transpile_ms=float(np.mean(t_t)) * 1e3,
                            simulate_ms=float(np.mean(t_s)) * 1e3)
        print(f'mbqc n={n}: transpile {out[f"n{n}"]["transpile_ms"]:.1f} ms, '
              f'simulate {out[f"n{n}"]["simulate_ms"]:.1f} ms')
    return out


# ------------------------------------------------------- reference comparison
def _import_reference():
    import types
    sys.path.insert(0, '/root/reference/src')
    for name, attrs in {'qiskit': ['QuantumCircuit'], 'svgwrite': ['Drawing'],
                        'bayes_opt': ['BayesianOptimization', 'UtilityFunction']}.items():
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            for a in attrs:
                setattr(mod, a, type(a, (), {}))
            sys.modules[name] = mod
    import deepquantum as ref_dq
    return ref_dq


def bench_reference_gradient(grid=((2, 6, 10, 14, 18, 22), (1, 5, 10)), steps=5):
    """Reference torch-CPU gradient grid (examples/benchmarks/benchmark_v420/
    gradient/gradient_deepquantum.py:24-56) — full n x layers spec, incl. the
    n=22 rows (VERDICT r3: our n22 rows had no vs-baseline). Rows flush
    incrementally and skip on resume: n=22/l=10 alone is ~minutes of torch CPU."""
    import torch
    ref_dq = _import_reference()
    out = dict(_recorded('gradient_ref_ms'))
    for nlayer in grid[1]:
        for n in grid[0]:
            rk = f'n{n}_l{nlayer}'
            if _skip_cell(out.get(rk)):
                print(f'reference gradient {rk}: cached {out[rk]}')
                continue
            nstep = steps if n < 22 else 2
            cir = ref_dq.QubitCircuit(n)
            for _ in range(nlayer):
                for i in range(n):
                    cir.rx(i)
                    cir.rz(i)
                    cir.rx(i)
                cir.cnot_ring()
            cir.observable(basis='x' * n)
            t0 = time.perf_counter()
            for _ in range(nstep):
                cir().squeeze()
                e = cir.expectation()
                e.backward()
            ms = (time.perf_counter() - t0) / nstep * 1e3
            out = _merge_row('gradient_ref_ms', rk, ms)
            print(f'reference gradient n={n} l={nlayer}: {ms:.1f} ms/step')
    return out


def bench_reference_hafnian(ns=(8, 12, 16), steps=5):
    """Reference torch-CPU hafnian on the SAME quantized matrices as
    bench_hafnian (seed rng(1)), plus the batch row (reference metric:
    benchmark_v420/hafnian/hafnian_deepquantum_batch.py — eigenvalue-trace
    hafnian_batch, reference photonic/hafnian_.py:93-126)."""
    import torch
    _import_reference()
    from deepquantum.photonic.hafnian_ import hafnian as ref_haf
    from deepquantum.photonic.hafnian_ import hafnian_batch as ref_haf_batch
    rng = np.random.default_rng(1)
    out = dict(_recorded('hafnian_ref_ms'))
    for n in ns:
        a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        host = (a + a.T).astype(np.complex64)
        m = torch.tensor(host.astype(np.complex128))
        for loop, rk in ((False, f'n{n}'), (True, f'loop_n{n}')):
            if _skip_cell(out.get(rk)):
                print(f'reference hafnian {rk}: cached {out[rk]}')
                continue
            ref_haf(m, loop=loop)                       # warm any lazy setup
            t0 = time.perf_counter()
            for _ in range(steps):
                ref_haf(m, loop=loop)
            ms = (time.perf_counter() - t0) / steps * 1e3
            out = _merge_row('hafnian_ref_ms', rk, ms)
            print(f'reference {"loop " if loop else ""}hafnian n={n}: '
                  f'{ms:.3f} ms (f64 CPU)')
    # batched throughput at fixed n — mirrors bench_hafnian's batch row
    n, B = 12, 100
    rk = f'batch{B}_n{n}'
    if not _skip_cell(out.get(rk)):
        zs = rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
        hosts = (zs + np.swapaxes(zs, 1, 2)).astype(np.complex64)
        mb = torch.tensor(hosts.astype(np.complex128))
        ref_haf_batch(mb[:1])
        t0 = time.perf_counter()
        for _ in range(max(steps // 2, 1)):
            ref_haf_batch(mb)
        bms = (time.perf_counter() - t0) / max(steps // 2, 1) * 1e3
        out = _merge_row('hafnian_ref_ms', rk,
                         dict(total_ms=bms, ms_per_hafnian=bms / B))
        print(f'reference hafnian batch={B} n={n}: {bms:.3f} ms total')
    return out


def bench_reference_torontonian(ns=(6, 8, 10, 12), steps=5):
    """Reference torch-CPU torontonian / loop torontonian on the SAME
    quantized matrices as bench_torontonian (seed rng(2)) (reference metric:
    benchmark_v420/torontonian/ + loop_torontonian/; reference
    photonic/torontonian_.py:27-49)."""
    import torch
    _import_reference()
    from deepquantum.photonic.torontonian_ import torontonian as ref_tor
    rng = np.random.default_rng(2)
    out = dict(_recorded('torontonian_ref_ms'))
    for n in ns:
        m = rng.standard_normal((2 * n, 2 * n)) * 0.1
        o = (np.eye(2 * n) - np.linalg.inv(np.eye(2 * n) + (m @ m.T))
             ).astype(np.complex64).astype(np.complex128)
        ot = torch.tensor(o)
        gam = (rng.standard_normal(2 * n) * 0.1).astype(np.complex64
                                                        ).astype(np.complex128)
        gam[n:] = np.conj(gam[:n])
        gt = torch.tensor(gam)
        for gamma, rk in ((None, f'n{n}'), (gt, f'loop_n{n}')):
            if _skip_cell(out.get(rk)):
                print(f'reference torontonian {rk}: cached {out[rk]}')
                continue
            ref_tor(ot, gamma)
            t0 = time.perf_counter()
            for _ in range(steps):
                ref_tor(ot, gamma)
            ms = (time.perf_counter() - t0) / steps * 1e3
            out = _merge_row('torontonian_ref_ms', rk, ms)
            print(f'reference {"loop " if gamma is not None else ""}'
                  f'torontonian 2n={2 * n}: {ms:.3f} ms (f64 CPU)')
    return out


def bench_reference_mbqc(ns=(3, 5, 7), reps=3):
    """Reference transpile + pattern-forward on the SAME random circuits as
    bench_mbqc (VERDICT r3 item 7; reference metric:
    benchmark_v420/MBQC_simulate/simulate_dq.py:25-44)."""
    ref_dq = _import_reference()
    specs = _mbqc_circuit_specs(ns, reps)
    out = dict(_recorded('mbqc_ref_ms'))
    warm = ref_dq.QubitCircuit(2)
    warm.h(0)
    warm.cnot(0, 1)
    warm.pattern()()
    for n in ns:
        rk = f'n{n}'
        if _skip_cell(out.get(rk)):
            print(f'reference mbqc {rk}: cached')
            continue
        t_t, t_s = [], []
        for ops in specs[n]:
            cir = _mbqc_build(ref_dq.QubitCircuit(n), ops)
            t0 = time.perf_counter()
            pat = cir.pattern()
            t_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            pat()
            t_s.append(time.perf_counter() - t0)
        row = dict(transpile_ms=float(np.mean(t_t)) * 1e3,
                   simulate_ms=float(np.mean(t_s)) * 1e3)
        out = _merge_row('mbqc_ref_ms', rk, row)
        print(f'reference mbqc n={n}: transpile {row["transpile_ms"]:.1f} ms, '
              f'simulate {row["simulate_ms"]:.1f} ms')
    return out


def bench_reference_permanent(ns=(10, 14, 18, 20), steps=2):
    import torch
    _import_reference()
    from deepquantum.photonic.qmath import permanent as ref_perm
    rng = np.random.default_rng(0)
    out = {}
    for n in ns:
        z = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        q, r = np.linalg.qr(z)
        u = torch.tensor(q * (np.diag(r) / np.abs(np.diag(r))), dtype=torch.complex128)
        t0 = time.perf_counter()
        for _ in range(steps):
            ref_perm(u)
        ms = (time.perf_counter() - t0) / steps * 1e3
        out[f'n{n}'] = ms
        print(f'reference permanent n={n}: {ms:.1f} ms (f64 CPU)')
    return out


SECTIONS = {
    'gradient': ('gradient_ms', bench_gradient),
    'gradient_large': ('gradient_large_ms', bench_gradient_large),
    'fusion': ('fusion_ablation_ms', bench_fusion_ablation),
    'window': ('window_ablation_ms', bench_window_ablation),
    'chain': ('chain_ablation_ms', bench_chain_ablation),
    'fusion_window': ('fusion_window_ablation_ms', bench_fusion_window),
    'grad_mxu': ('grad_mxu_ablation_ms', bench_grad_mxu_ablation),
    'denmat': ('denmat_grad_ms', bench_denmat),
    'batched_qml': ('batched_qml_grad_ms', bench_batched_qml),
    'hessian': ('hessian_ms', bench_hessian),
    'roofline': ('gate_apply_roofline', bench_gate_apply_roofline),
    'permanent': ('permanent_ms', bench_permanent),
    'hafnian': ('hafnian_ms', bench_hafnian),
    'torontonian': ('torontonian_ms', bench_torontonian),
    'mbqc': ('mbqc_ms', bench_mbqc),
    'shardmap_grad': ('shardmap_grad_ms', bench_shardmap_grad),
    # last: the pre-sharding adjoint once hard-crashed the worker at n > 14
    'gradient_adjoint': ('gradient_adjoint_ms', bench_gradient_adjoint),
}
REF_SECTIONS = {
    'gradient': ('gradient_ref_ms', bench_reference_gradient),
    'permanent': ('permanent_ref_ms', bench_reference_permanent),
    'hafnian': ('hafnian_ref_ms', bench_reference_hafnian),
    'torontonian': ('torontonian_ref_ms', bench_reference_torontonian),
    'mbqc': ('mbqc_ref_ms', bench_reference_mbqc),
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    which = set(args) if args else {'all'}
    path = os.path.join(_HERE, 'results.json')
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    if '--ref-only' not in sys.argv:
        for name, (key, fn) in SECTIONS.items():
            if which & {name, 'all'}:
                results[key] = fn()
                _atomic_dump(results, path)
    if REFERENCE:
        for name, (key, fn) in REF_SECTIONS.items():
            if which & {name, 'all'}:
                results[key] = fn()
                _atomic_dump(results, path)
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
