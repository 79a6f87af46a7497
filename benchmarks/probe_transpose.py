"""On-chip probe 3 (v2): cost of qubit-relabel transposes + remaining gate
classes.

v1 lessons: (a) back-to-back involution transposes cancel in XLA — interleave
a gate so nothing cancels; (b) NEVER reshape to [2]*n on TPU (each size-2 dim
is tile-padded: 64x expansion, OOM) — express bit permutations as grouped-
contiguous-run reshapes + small-rank transposes.

  blockswap+g  swap bit blocks [0:10)<->[14:24) via (2,1024,16,1024) transpose
               (axes 0,3,2,1), one head gate between — the relabel primitive
  hoist3+g     rotate (2, A, 8, B) -> (2, 8, A, B): bring 3 contiguous low
               wires into head slots
  tileswap+g   swap sublane-bits <-> lane-bits blocks (last 128x128 transpose)
  h2m1/h2t1/h1m1t1  remaining mixed gate classes
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
REPS = 16
GATE_MS = None      # measured head-gate ms, filled by the first case


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
    global GATE_MS
    rng = np.random.default_rng(0)
    z = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    u = np.linalg.qr(z)[0]
    mre = jnp.asarray(np.real(u).astype(np.float32))
    mim = jnp.asarray(np.imag(u).astype(np.float32))
    x_flat = jnp.linspace(0, 1, 2 << N, dtype=jnp.float32).reshape(2, 1 << N)

    # head-gate baseline in this scan shape (for subtracting below)
    @jax.jit
    def gates_only(x, eps):
        x = x + eps
        def body(x, _):
            for _ in range(4):
                x = planar_evolve(x, mre, mim, N, (0, 1, 2))
            return x, None
        return jnp.sum(jax.lax.scan(body, x, None, length=REPS // 4)[0])

    GATE_MS = timed(gates_only, x_flat, REPS, 'head_gate')

    def run_pair(xform, label):
        """Scan body: transpose -> gate -> transpose -> gate (involution
        interleaved with gates so nothing cancels). ms reported PER
        TRANSFORM after subtracting the measured gate time."""
        @jax.jit
        def f(x, eps):
            x = x + eps
            def body(x, _):
                for _ in range(2):
                    x = xform(x)
                    x = planar_evolve(x, mre, mim, N, (0, 1, 2))
                return x, None
            return jnp.sum(jax.lax.scan(body, x, None, length=REPS // 2)[0])

        float(f(x_flat, jnp.zeros((), jnp.float32)))
        t0 = time.perf_counter()
        float(f(x_flat, jnp.asarray(1e-4, jnp.float32)))
        total = (time.perf_counter() - t0) * 1e3 - RT
        ms = total / REPS - GATE_MS          # per transform
        gbps = 2 * 8 * (1 << N) / (ms * 1e-3) / 1e9
        print(f'{label:12s} {ms:8.4f} ms/xform  {gbps:6.1f} GB/s')

    # block swap [0:10) <-> [14:24): (2, 2^10, 2^4, 2^10) axes (0,3,2,1)
    a, b = 10, N - 20

    def blockswap(x):
        v = x.reshape(2, 1 << a, 1 << b, 1 << a)
        return jnp.transpose(v, (0, 3, 2, 1)).reshape(2, 1 << N)

    run_pair(blockswap, 'blockswap')

    # hoist 3 contiguous low wires (N-4..N-2, bits 2..4) into head slots:
    # (2, A, 8, B) -> (2, 8, A, B)
    def hoist3(x):
        v = x.reshape(2, 1 << (N - 5), 8, 4)
        return jnp.transpose(v, (0, 2, 1, 3)).reshape(2, 1 << N)

    run_pair(hoist3, 'hoist3')

    # sublane<->lane tile swap: (2, A, 128, 128) last-two transpose
    def tileswap(x):
        v = x.reshape(2, 1 << (N - 14), 128, 128)
        return jnp.transpose(v, (0, 1, 3, 2)).reshape(2, 1 << N)

    run_pair(tileswap, 'tileswap')

    # mid-block <-> head-block swap keeping lanes fixed:
    # (2, H(10), M(7), L(7)) -> (2, M, H, L)
    def midswap(x):
        v = x.reshape(2, 1 << (N - 14), 128, 128)
        return jnp.transpose(v, (0, 2, 1, 3)).reshape(2, 1 << N)

    run_pair(midswap, 'midswap')

    # remaining mixed gate classes
    for label, ws in (('h2m1', (8, 9, 10)), ('h2t1', (8, 9, 18)),
                      ('h1m1t1', (9, 12, 20))):
        _, _, _, bshape, _, _ = _geometry(N, list(ws))

        def make(ws=ws):
            @jax.jit
            def f(x, eps):
                x = x + eps
                def body(x, _):
                    for _ in range(4):
                        x = planar_evolve(x, mre, mim, N, ws)
                    return x, None
                return jnp.sum(jax.lax.scan(body, x, None, length=REPS // 4)[0])
            return f

        timed(make(), x_flat.reshape(bshape), REPS, label)


if __name__ == '__main__':
    main()
