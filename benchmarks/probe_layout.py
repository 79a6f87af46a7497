"""On-chip probe: where does the end-to-end grad step lose bandwidth vs the
bare planar kernel chain? (VERDICT r3 item 2)

Hypotheses probed, each as a timed variant of a 64-gate planar chain at n:
  flat    carry (2, 2^n)            — current to_planar canonical shape
  tile    carry (2*2^n/16384, 128, 128) — tile-aligned rows, same linear order
  block   carry in kernel block shape (the roofline 'bare' variant)
  nonscan 64 gates unrolled in one jit body, carry (2, 2^n)
Then the real grad-step pieces at n:
  fwd     forward planar chain only (as _sim_planar does, incl. to/from_planar)
  pexp    forward + planar_pauli_expectation
  grad    full value_and_grad step (the headline workload shape)

Prints ms/gate-pass and achieved GB/s per variant (one pass = R+W of the
2 * 4 * 2^n-byte planar state).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepquantum_tpu.ops.planar_gate import planar_evolve, _geometry

N = int(os.environ.get('PROBE_N', 24))
NGATE = 64
BODY = 16


def rt_ms():
    f = jax.jit(lambda e: e * 2.0 + 1.0)
    float(f(jnp.asarray(0.5, jnp.float32)))
    ts = []
    for k in range(3):
        t0 = time.perf_counter()
        float(f(jnp.asarray(0.1 * k, jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] * 1e3


RT = None


def timed(fn, x0, passes, label):
    """fn: jitted (x, eps)->scalar running `passes` state passes."""
    global RT
    if RT is None:
        RT = rt_ms()
    float(fn(x0, jnp.zeros((), jnp.float32)))
    t0 = time.perf_counter()
    float(fn(x0, jnp.asarray(1e-4, jnp.float32)))
    total = (time.perf_counter() - t0) * 1e3 - RT
    ms = total / passes
    gbps = 2 * 8 * (1 << N) / (ms * 1e-3) / 1e9
    print(f'{label:12s} {ms:8.4f} ms/pass  {gbps:6.1f} GB/s')
    return ms


def main():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    u = np.linalg.qr(z)[0]
    mre = jnp.asarray(np.real(u).astype(np.float32))
    mim = jnp.asarray(np.imag(u).astype(np.float32))
    wsets = [(0, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11)] * (BODY // 4)

    x_flat = jnp.linspace(0, 1, 2 << N, dtype=jnp.float32).reshape(2, 1 << N)

    # ---- scan, flat carry
    @jax.jit
    def scan_flat(x, eps):
        x = x + eps
        def body(x, _):
            for ws in wsets:
                x = planar_evolve(x, mre, mim, N, ws)
            return x, None
        x = jax.lax.scan(body, x, None, length=NGATE // BODY)[0]
        return jnp.sum(x)

    timed(scan_flat, x_flat, NGATE, 'scan_flat')

    # ---- scan, tile-aligned carry (same linear order, rows x 128 x 128)
    tshape = (2 * (1 << N) // (128 * 128), 128, 128)

    @jax.jit
    def scan_tile(x, eps):
        x = x + eps
        def body(x, _):
            y = x.reshape(2, 1 << N)
            for ws in wsets:
                y = planar_evolve(y, mre, mim, N, ws)
            return y.reshape(tshape), None
        x = jax.lax.scan(body, x, None, length=NGATE // BODY)[0]
        return jnp.sum(x)

    timed(scan_tile, x_flat.reshape(tshape), NGATE, 'scan_tile')

    # ---- scan, kernel block carry (roofline 'bare')
    _, _, _, bshape, _, _ = _geometry(N, [0, 1, 2])

    @jax.jit
    def scan_block(x, eps):
        x = x + eps
        def body(x, _):
            for _ in range(BODY):
                x = planar_evolve(x, mre, mim, N, (0, 1, 2))
            return x, None
        x = jax.lax.scan(body, x, None, length=NGATE // BODY)[0]
        return jnp.sum(x)

    timed(scan_block, x_flat.reshape(bshape), NGATE, 'scan_block')

    # ---- scan, block carry but ROTATING wires (is it the wires or the carry?)
    @jax.jit
    def scan_block_rot(x, eps):
        x = x + eps
        def body(x, _):
            y = x.reshape(2, 1 << N)
            for ws in wsets:
                y = planar_evolve(y, mre, mim, N, ws)
            return y.reshape(bshape), None
        x = jax.lax.scan(body, x, None, length=NGATE // BODY)[0]
        return jnp.sum(x)

    timed(scan_block_rot, x_flat.reshape(bshape), NGATE, 'scan_blkrot')

    # ---- no scan: 64 gates unrolled in one body, flat carry
    @jax.jit
    def nonscan(x, eps):
        x = x + eps
        for k in range(NGATE // BODY):
            for ws in wsets:
                x = planar_evolve(x, mre, mim, N, ws)
        return jnp.sum(x)

    timed(nonscan, x_flat, NGATE, 'nonscan')

    # ---- forward + pauli + grad on the real circuit path
    import deepquantum_tpu as dq
    NL = 2 if N >= 22 else 5
    cir = dq.QubitCircuit(N)
    for _ in range(NL):
        for i in range(N):
            cir.rx(i)
            cir.rz(i)
            cir.rx(i)
        cir.cnot_ring()
    cir.observable(list(range(N)), basis='x' * N)
    plan = cir._fused_plan()
    ngroups = len(plan)
    from deepquantum_tpu.circuit import _pauli_obs_blocks
    npauli = len(_pauli_obs_blocks(cir.observables[0]))
    print(f'fused plan: {ngroups} groups, pauli blocks: {npauli}')

    p0 = cir.params

    @jax.jit
    def fwd(p, eps):
        s = cir.forward(params=p + eps)
        return jnp.sum(jnp.real(s))

    # forward chain = ngroups passes (+ to/from planar ~1)
    timed(fwd, p0, ngroups, 'fwd/group')

    @jax.jit
    def pexp(p, eps):
        return cir.expectation(params=p + eps)[0]

    timed(pexp, p0, ngroups + npauli, 'pexp/group')

    gfn = jax.value_and_grad(lambda p: cir.expectation(params=p)[0])

    @jax.jit
    def gstep(p, eps):
        _, g = gfn(p + eps)
        return jnp.sum(g)

    # backward: 3 passes/group unfused + fwd + pauli fwd/bwd
    est = ngroups * 4 + npauli + 2
    timed(gstep, p0, est, f'grad/{est}p')

    # grad step inside a lax.scan over optimizer steps (the bench harness)
    @jax.jit
    def gscan(p, eps):
        def body(p, _):
            _, g = gfn(p)
            return p - 1e-3 * g, None
        return jnp.sum(jax.lax.scan(body, p + eps, None, length=4)[0])

    timed(gscan, p0, est * 4, f'gradscan/{est}p')


if __name__ == '__main__':
    main()
