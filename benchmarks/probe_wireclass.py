"""On-chip probe 2: is the rotating-wires slowdown (probe_layout.py) caused by
(a) intrinsic roll cost of mid/tail-wire gates, or (b) relayout copies when
consecutive gates expose different logical views?

Per-class same-wires scans (each in its own block carry — no shape churn):
  head3   (0,1,2)    all head (explicit size-2 axes)
  h1m2    (9,10,11)  1 head + 2 mid (sublane rolls)      [n=24]
  mid3    (14,15,16) all mid
  m1t2    (16,17,18) 1 mid + 2 tail
  tail3   (21,22,23) all tail (lane rolls)
Then rotation WITHOUT roll wires:
  rothead (0,1,2)->(3,4,5)->(6,7,8)->(7,8,9) all-head rotating sets
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
    x_flat = jnp.linspace(0, 1, 2 << N, dtype=jnp.float32).reshape(2, 1 << N)

    cases = [('head3', (0, 1, 2)), ('h1m2', (9, 10, 11)),
             ('mid3', (14, 15, 16)), ('m1t2', (16, 17, 18)),
             ('tail3', (21, 22, 23))]
    for label, ws in cases:
        _, _, _, bshape, _, _ = _geometry(N, list(ws))

        def make(ws=ws):
            @jax.jit
            def f(x, eps):
                x = x + eps
                def body(x, _):
                    for _ in range(BODY):
                        x = planar_evolve(x, mre, mim, N, ws)
                    return x, None
                return jnp.sum(jax.lax.scan(body, x, None, length=NGATE // BODY)[0])
            return f

        timed(make(), x_flat.reshape(bshape), NGATE, label)

    # rotating all-head wire sets, flat carry (tests shape churn alone)
    wsets = [(0, 1, 2), (3, 4, 5), (6, 7, 8), (7, 8, 9)] * (BODY // 4)

    @jax.jit
    def rothead(x, eps):
        x = x + eps
        def body(x, _):
            for ws in wsets:
                x = planar_evolve(x, mre, mim, N, ws)
            return x, None
        return jnp.sum(jax.lax.scan(body, x, None, length=NGATE // BODY)[0])

    timed(rothead, x_flat, NGATE, 'rothead')

    # rotating all-head sets, block carry of (0,1,2)
    _, _, _, bshape, _, _ = _geometry(N, [0, 1, 2])

    @jax.jit
    def rothead_blk(x, eps):
        x = x + eps
        def body(x, _):
            y = x.reshape(2, 1 << N)
            for ws in wsets:
                y = planar_evolve(y, mre, mim, N, ws)
            return y.reshape(bshape), None
        return jnp.sum(jax.lax.scan(body, x, None, length=NGATE // BODY)[0])

    timed(rothead_blk, x_flat.reshape(bshape), NGATE, 'rothead_blk')


if __name__ == '__main__':
    main()
