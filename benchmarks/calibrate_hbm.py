"""HBM bandwidth calibration on the attached TPU.

Establishes the achievable-streaming denominator for the gate-apply roofline
(BASELINE.md north star: gate-apply >= 80% of HBM roofline). Measures, at
sizes large enough to defeat any cache (>= 256 MB per buffer):

  1. f32 stream:    y = a*x + b       (read 1, write 1)
  2. f32 triad:     y = x1 + s*x2     (read 2, write 1)
  3. c64 stream:    y = s*x           (read 1, write 1, complex)
  4. planar gate:   (2, M) f32 planes through an 8x8 real combo (the planar
                    kernel's arithmetic shape, XLA-compiled)
  5. gemm tail:     (M, 128) f32 @ (128, 128)  (the tail-expanded shape)
  6. gemm tail c64: same in complex64

Each timing chains `steps` iterations inside one jitted lax.scan (tunnel- and
memoization-proof). Prints GB/s of actually-moved bytes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def timed(make_loop, x0, steps, bytes_moved):
    from bench_suite import _scan_time
    ms = _scan_time(make_loop, x0, steps)
    return ms, bytes_moved / (ms * 1e-3) / 1e9


def main(n=26, steps=30):
    results = {}
    size = 1 << n                                   # elements
    f32_bytes = 4 * size

    # -- 1. f32 stream
    x = jnp.linspace(0.0, 1.0, size, dtype=jnp.float32)

    def stream(k):
        def loop(x):
            def body(x, c):
                return x * c + 0.5, None
            cs = jnp.linspace(1.0, 1.0001, k)
            return jax.lax.scan(body, x, cs)[0]
        return loop

    ms, gbps = timed(stream, x, steps, 2 * f32_bytes)
    results['f32_stream_gbps'] = round(gbps, 1)
    print(f'f32 stream   n=2^{n}: {ms:7.3f} ms  {gbps:6.1f} GB/s')

    # -- 2. f32 triad (read 2, write 1)
    x2 = jnp.linspace(1.0, 2.0, size, dtype=jnp.float32)

    def triad(k):
        def loop(pair):
            a, b = pair
            def body(a, c):
                return a * c + b, None
            cs = jnp.linspace(0.5, 0.5001, k)
            return jax.lax.scan(body, a, cs)[0], b
        return loop

    ms, gbps = timed(triad, (x, x2), steps, 3 * f32_bytes)
    results['f32_triad_gbps'] = round(gbps, 1)
    print(f'f32 triad    n=2^{n}: {ms:7.3f} ms  {gbps:6.1f} GB/s')

    # -- 3. c64 stream (built on device; complex can't cross the tunnel)
    def c64_stream(k):
        def loop(seed):
            z = jax.lax.complex(seed, seed * 0.5)
            def body(z, c):
                return z * c, None
            cs = jnp.linspace(1.0, 1.0001, k).astype(jnp.complex64)
            return jax.lax.scan(body, z, cs)[0].real
        return loop

    ms, gbps = timed(c64_stream, x[: size // 2], steps, 2 * 8 * (size // 2))
    results['c64_stream_gbps'] = round(gbps, 1)
    print(f'c64 stream   n=2^{n - 1}: {ms:7.3f} ms  {gbps:6.1f} GB/s')

    # -- 4. planar 8x8 combo: state (8, M) re+im planes, y = A@xr etc.
    m = size // 8
    xr = x.reshape(8, m)
    xi = (x * 0.5).reshape(8, m)
    ar = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)), jnp.float32)
    ai = jnp.asarray(np.random.default_rng(1).normal(size=(8, 8)), jnp.float32)

    def planar(k):
        def loop(pair):
            r, i = pair
            def body(c, _):
                r, i = c
                nr = ar @ r - ai @ i
                ni = ar @ i + ai @ r
                return (nr, ni), None
            return jax.lax.scan(body, (r, i), None, length=k)[0]
        return loop

    ms, gbps = timed(planar, (xr, xi), steps, 2 * 2 * f32_bytes)
    print(f'planar 8x8   n=2^{n}: {ms:7.3f} ms  {gbps:6.1f} GB/s (r+w of both planes)')

    # -- 5. f32 tail GEMM: (M, 128) @ (128, 128)
    mt = size // 128
    xt = x.reshape(mt, 128)
    bt = jnp.asarray(np.random.default_rng(2).normal(size=(128, 128)), jnp.float32)

    def gemm(k):
        def loop(xt):
            def body(xt, _):
                return jnp.dot(xt, bt, precision=jax.lax.Precision.HIGHEST) * 0.1, None
            return jax.lax.scan(body, xt, None, length=k)[0]
        return loop

    ms, gbps = timed(gemm, xt, steps, 2 * f32_bytes)
    print(f'f32 gemm128  n=2^{n}: {ms:7.3f} ms  {gbps:6.1f} GB/s')

    # -- 6. c64 tail GEMM (device-built)
    def c64_gemm(k):
        def loop(seed):
            z = jax.lax.complex(seed, seed * 0.5).reshape(mt // 2, 128)
            bc = bt.astype(jnp.complex64)[:, :]
            def body(z, _):
                return jnp.dot(z, bc, precision=jax.lax.Precision.HIGHEST) * 0.1, None
            out = jax.lax.scan(body, z, None, length=k)[0]
            return out.real
        return loop

    ms, gbps = timed(c64_gemm, x[: size // 2], steps, 2 * 8 * (size // 2))
    results['c64_gemm128_gbps'] = round(gbps, 1)
    print(f'c64 gemm128  n=2^{n - 1}: {ms:7.3f} ms  {gbps:6.1f} GB/s')

    # merge into the tracked results file so the roofline denominators ship
    # with the benchmark record
    import json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'results.json')
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data['hbm_calibration_gbps'] = results
    with open(path, 'w') as f:
        json.dump(data, f, indent=2)
    print(f'wrote {path}')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 26)
