"""Pallas planar-f32 gate application — the TPU hot-path kernel.

The statevector lives as two f32 planes (re, im) of shape (2, 2^n) and every
fused gate group (k <= 3 wires, from QubitCircuit._fused_plan) is ONE Pallas
kernel launch that updates the state **in place** (input_output_aliases).
Rationale, measured on a v5e through the axon tunnel at n=26:

- XLA complex64 einsum gate apply:            ~100-140 GB/s
- XLA planar f32 matmul forms:                 200-330 GB/s
- this kernel (aliased, planar, VPU combos):   ~650-690 GB/s
- practical HBM ceiling (f32 stream):          ~590-680 GB/s  (peak 819)

i.e. the kernel runs at the speed of a bare memory copy — the BASELINE.md
north star (gate apply >= 80 % of HBM roofline). The 2x over the best
non-aliased form comes from donating the input buffer: without aliasing, XLA
materializes a second 2^n buffer per gate and the extra write halves
effective bandwidth.

How a gate on arbitrary wires maps onto the (sublane, lane) tile geometry
(state viewed as rows of T = 128 lanes, blocked RB = 64 rows at a time):

- **head wires** (amplitude stride >= RB*T): exposed as explicit size-2 axes
  of a logical reshape; the BlockSpec covers both values, so one kernel
  invocation sees all 2^kh head combinations of a row block.
- **mid wires** (T <= stride < RB*T): the partner amplitude lives in the same
  block at a sublane offset; partners materialize via two sublane rolls and
  a select (XOR trick: bit=1 rows take roll(+s), bit=0 rows take roll(-s)).
- **tail wires** (stride < T): same XOR trick with lane rolls.

The gate matrix (pre-permuted to sorted-wire order, split into re/im f32
planes) arrives in SMEM; the kernel unrolls the 2^k x 2^k complex
combination with scalar reads, masking each low-bit output pattern with
0/1 vectors built from broadcasted_iota. Everything is static per
(n, wires, k) signature, so Mosaic compiles one kernel per gate shape and
the jit cache reuses it across layers.

Gradients: gate application is linear and unitary, so the custom VJP
recomputes the forward INPUT from the saved OUTPUT (x = U^H y) instead of
saving x — the forward stays copy-free in-place, memory stays at one state
buffer, and the backward costs one extra kernel pass. Matrix cotangents are
K x K inner products of combo-slices, done as one XLA einsum pass.

Reference semantics matched: qmath.py:485 evolve_state (wire 0 = leftmost /
most-significant axis; matrix row order follows the wires list).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['planar_evolve', 'to_planar', 'from_planar', 'planar_supported',
           'fwd_ad_active', 'planar_superop', 'planar_superop_matrix']

_T_BITS = 7            # lane block: T = 128
_T = 1 << _T_BITS
_RB_BITS_MAX = 7       # rows per block: RB = 128 (measured fastest, see header)


def to_planar(psi: jnp.ndarray) -> jnp.ndarray:
    """complex (…,) statevector -> (2, N) real planes (policy real dtype:
    f32 on TPU, f64 under the x64 oracle-test policy)."""
    from ..config import rdtype
    flat = psi.reshape(-1)
    return jnp.stack([jnp.real(flat).astype(rdtype()),
                      jnp.imag(flat).astype(rdtype())])


def from_planar(x: jnp.ndarray) -> jnp.ndarray:
    """(…, 2, N) real planes -> complex (…, N) statevector."""
    return jax.lax.complex(x[..., 0, :], x[..., 1, :])


def to_planar_batched(psi: jnp.ndarray) -> jnp.ndarray:
    """complex (B, dim) batch -> (B, 2, dim) real planes."""
    from ..config import rdtype
    return jnp.stack([jnp.real(psi).astype(rdtype()),
                      jnp.imag(psi).astype(rdtype())], axis=1)


def planar_supported(n: int, wires) -> bool:
    """The kernel handles k <= 3 distinct wires on n >= 10 qubits."""
    return 10 <= n and 1 <= len(set(wires)) <= 3


def fwd_ad_active(*vals) -> bool:
    """True when any value carries a forward-mode (JVP) trace.

    The planar chain differentiates through a chain-level custom_vjp, which
    JAX cannot forward-differentiate (and the pallas aliasing has no JVP
    rule), so second-order transforms like jax.hessian = jacfwd(jacrev(f))
    must route to the XLA einsum path. Detected per-trace: circuits stay on
    the planar engine under plain jit/grad and drop to einsum only inside a
    jvp/jacfwd transform (reference metric this serves:
    benchmark_v420/hessian/hessian_deepquantum.py)."""
    try:
        from jax.interpreters.ad import JVPTracer
    except ImportError:  # pragma: no cover — moved in newer JAX
        from jax._src.interpreters.ad import JVPTracer

    def carries(v):
        depth = 0
        while isinstance(v, jax.core.Tracer) and depth < 32:
            if isinstance(v, JVPTracer):
                return True
            # unwrap one layer: BatchTracer.val, JVPTracer.primal, etc.
            inner = getattr(v, 'val', None)
            if inner is None:
                inner = getattr(v, 'primal', None)
            if inner is None:
                return False
            v = inner
            depth += 1
        return False

    return any(carries(v) for v in vals if v is not None)


def _classify(n: int, wires_sorted):
    """Split sorted wires into (head, mid, tail) by amplitude-stride regime
    and pick the row-block size RB."""
    rb_bits = min(_RB_BITS_MAX, max(n - _T_BITS, 0))
    head, mid, tail = [], [], []
    for w in wires_sorted:
        b = n - 1 - w               # bit position (stride = 2^b)
        if b < _T_BITS:
            tail.append(w)
        elif b < _T_BITS + rb_bits:
            mid.append(w)
        else:
            head.append(w)
    return head, mid, tail, rb_bits


def _block_machinery(kh: int, roll_info, rb: int):
    """Per-block machinery shared by EVERY planar kernel body (forward,
    grad reduction VPU/MXU, fused backward): bit vectors, head indexing,
    XOR-roll partner versions, low-bit output masks, and the version<->
    gate-bit order map.

    roll_info: list of (axis, stride) per non-head wire in sorted-wire
    order (axis 0 = sublane roll for mid wires, 1 = lane roll for tail).
    Returns (h_index, versions, masks, vrev); masks[lo] is None when there
    are no roll wires."""
    from jax.experimental.pallas import tpu as pltpu
    nr = len(roll_info)
    nv = 1 << nr
    sub_id = jax.lax.broadcasted_iota(jnp.int32, (rb, _T), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rb, _T), 1)
    # 0/1 bit vector per roll wire (1 where that gate bit is set)
    bit_vecs = []
    for axis, stride in roll_info:
        ids = sub_id if axis == 0 else lane_id
        bit_vecs.append((ids >> (stride.bit_length() - 1)) & 1)

    def h_index(h):
        # full block index for head combo h: plane is prepended by caller;
        # block dims are [2] + [1, 2]*kh + [1, rb, T] — gap axes take 0
        idx = []
        for i in range(kh):
            idx.extend([0, (h >> (kh - 1 - i)) & 1])
        idx.append(0)
        return tuple(idx)

    def versions(s0):
        # XOR partner versions of an (RB, T) slice, LSB-first in roll_info
        # order (bit=1 positions take roll(+s), bit=0 take roll(-s))
        vs = [s0]
        for bi, (axis, stride) in enumerate(roll_info):
            mask = bit_vecs[bi].astype(jnp.bool_)
            size = rb if axis == 0 else _T
            cur = len(vs)
            for vv in range(cur):
                v = vs[vv]
                vs.append(jnp.where(mask, pltpu.roll(v, stride, axis),
                                    pltpu.roll(v, size - stride, axis)))
        return vs

    # 0/1 f32 mask per low-bit output pattern (None when no roll wires)
    masks = []
    for lo in range(nv):
        m = None
        for bi in range(nr):
            want = (lo >> (nr - 1 - bi)) & 1
            mb = (bit_vecs[bi] == want)
            m = mb if m is None else jnp.logical_and(m, mb)
        masks.append(None if m is None else m.astype(jnp.float32))

    def vrev(v):
        # version list is built LSB-first in roll_info order; gate low bits
        # are MSB-first (sorted-wire order) — map between the two
        return sum((((v >> (nr - 1 - bi)) & 1) << bi) for bi in range(nr))

    return h_index, versions, masks, vrev


def _apply_combos(V, mre_ref, mim_ref, kh, nr, masks, vrev):
    """Full 2^k complex combination of version-expanded slices V[plane][head]
    against the SMEM matrix planes; returns outs[plane][head] blocks."""
    KH = 1 << kh
    nv = 1 << nr
    outs = [[None] * KH for _ in range(2)]
    for a in range(KH):
        outr = None
        outi = None
        for lo in range(nv):
            accr = None
            acci = None
            for b in range(KH):
                for li in range(nv):
                    i_out = (a << nr) | lo
                    i_in = (b << nr) | li
                    v = vrev(lo ^ li)
                    cr = mre_ref[i_out, i_in]
                    ci = mim_ref[i_out, i_in]
                    xr = V[0][b][v]
                    xi = V[1][b][v]
                    tr = xr * cr - xi * ci
                    ti = xr * ci + xi * cr
                    accr = tr if accr is None else accr + tr
                    acci = ti if acci is None else acci + ti
            if nv == 1:
                outr, outi = accr, acci
            else:
                mr = masks[lo] * accr
                mi = masks[lo] * acci
                outr = mr if outr is None else outr + mr
                outi = mi if outi is None else outi + mi
        outs[0][a] = outr
        outs[1][a] = outi
    return outs


def _reduce_vpu(G, XV, part_ref, kh, nr, masks, vrev):
    """Matrix-cotangent partials via scalar SMEM stores: G[p][a] is the raw
    g slice, XV[p][b] the version list of the gate-INPUT slice.
    part[0] = <g, x> combos (dmre), part[1] = (gi xr - gr xi) (dmim)."""
    KH = 1 << kh
    nv = 1 << nr
    for a in range(KH):
        for lo in range(nv):
            i_out = (a << nr) | lo
            gr = G[0][a]
            gi = G[1][a]
            if masks[lo] is not None:
                gr = gr * masks[lo]
                gi = gi * masks[lo]
            for b in range(KH):
                for li in range(nv):
                    i_in = (b << nr) | li
                    v = vrev(lo ^ li)
                    xr = XV[0][b][v]
                    xi = XV[1][b][v]
                    part_ref[0, 0, i_out, i_in] = jnp.sum(gr * xr + gi * xi)
                    part_ref[0, 1, i_out, i_in] = jnp.sum(gi * xr - gr * xi)


def _reduce_mxu(G, XV, part_ref, kh, nr, masks):
    """MXU variant of the cotangent reduction: stack all masked-g combos and
    x versions once, contract the lane axis with the sublane axis batched
    (Mosaic accepts a single contracting dim; sublanes reduce in a tiny VPU
    epilogue). Output is in VERSION space — the caller gathers columns
    through _version_perm outside the kernel (scalar scatters can't target
    VMEM and the (K, K) tensor store requires VMEM)."""
    KH = 1 << kh
    nv = 1 << nr
    G_all = [[], []]   # K rows of (rb, T): g slice a masked by lo
    X_all = [[], []]   # K cols of (rb, T): version v of x slice b
    for p in range(2):
        for a in range(KH):
            ga = G[p][a]
            for lo in range(nv):
                G_all[p].append(ga if masks[lo] is None else ga * masks[lo])
        for b in range(KH):
            X_all[p].extend(XV[p][b])
    gr = jnp.stack(G_all[0], axis=1)   # (rb, K, T)
    gi = jnp.stack(G_all[1], axis=1)
    xr = jnp.stack(X_all[0], axis=1)
    xi = jnp.stack(X_all[1], axis=1)
    dn = (((2,), (2,)), ((0,), (0,)))
    hp = jax.lax.Precision.HIGHEST
    rr = jax.lax.dot_general(gr, xr, dn, precision=hp,
                             preferred_element_type=jnp.float32)
    ii = jax.lax.dot_general(gi, xi, dn, precision=hp,
                             preferred_element_type=jnp.float32)
    ir = jax.lax.dot_general(gi, xr, dn, precision=hp,
                             preferred_element_type=jnp.float32)
    ri = jax.lax.dot_general(gr, xi, dn, precision=hp,
                             preferred_element_type=jnp.float32)
    part_ref[0, 0] = jnp.sum(rr + ii, axis=0)
    part_ref[0, 1] = jnp.sum(ir - ri, axis=0)


def _kernel_body(x_ref, mre_ref, mim_ref, y_ref, *, kh, roll_info, rb, koff):
    """One block: (2, [2]*kh, RB, T) planes; full 2^k complex combination.

    koff = kh + len(roll_info) (total wire count's low part offset helper).
    """
    KH = 1 << kh
    nr = len(roll_info)
    h_index, versions, masks, vrev = _block_machinery(kh, roll_info, rb)
    V = [[versions(x_ref[(p,) + h_index(h)]) for h in range(KH)]
         for p in range(2)]
    outs = _apply_combos(V, mre_ref, mim_ref, kh, nr, masks, vrev)
    for p in range(2):
        for a in range(KH):
            y_ref[(p,) + h_index(a)] = outs[p][a]


def _geometry(n: int, ws, rb_bits_max: int = _RB_BITS_MAX):
    """Shared block geometry for the forward and grad kernels: the logical
    view exposing head wires as (2, A0, 2, A1, 2, ..., Ak, RB, T), the
    per-block roll recipe for mid/tail wires, and the BlockSpec pieces.

    ``rb_bits_max`` lets two-state kernels (the fused backward) shrink the
    row block: VMEM is ~16 MB/core and y + g blocks at kh = 3, RB = 128 are
    2 MB each before double buffering. The smaller window cannot
    reclassify wires for its only use (kh = 3 with k <= 3 means every wire
    is already head, far above both windows), so only RB changes."""
    head, mid, tail, rb_bits = _classify(n, ws)
    rb_bits = min(rb_bits, rb_bits_max)
    kh = len(head)
    rb = 1 << rb_bits

    roll_info = []
    for w in mid:
        b = n - 1 - w
        roll_info.append((0, 1 << (b - _T_BITS)))     # sublane stride (rows)
    for w in tail:
        b = n - 1 - w
        roll_info.append((1, 1 << b))                 # lane stride

    shape = [2]
    grid_axes = []
    prev_bit = n                                       # exclusive upper bit
    for w in head:
        b = n - 1 - w
        gap = prev_bit - b - 1
        shape.append(1 << gap)
        grid_axes.append(1 << gap)
        shape.append(2)
        prev_bit = b
    low_bits = prev_bit - _T_BITS - rb_bits            # rows above RB blocks
    shape.append(1 << max(low_bits, 0))
    grid_axes.append(1 << max(low_bits, 0))
    shape.append(rb)
    shape.append(_T)

    block = [2]
    for _ in head:
        block.extend([1, 2])
    block.extend([1, rb, _T])
    return kh, rb, roll_info, shape, grid_axes, block


def _planar_apply(x, mre, mim, n: int, wires, interpret: bool = False):
    """x: (2, 2^n) f32 — or (B, 2, 2^n) batched with per-sample matrix
    planes (B, K, K); m planes in SORTED-wire order. A batched state adds a
    leading grid dimension (one kernel invocation per (sample, block)); the
    kernel body is unchanged because the batch block axis is squeezed out
    (None in block_shape). This is how vmapped QML training rides the
    kernel: the batch is a grid axis, not a vmap axis.

    NOT wrapped in jax.jit: an inner jit boundary would block XLA from
    donating the state buffer into the aliased pallas_call when this is
    traced inside an outer jit/scan — measured as a 3.4x slowdown (extra
    2^n copy per gate). Always call under an outer jit.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ws = sorted(wires)
    kh, rb, roll_info, shape, grid_axes, block = _geometry(n, ws)
    batched = x.ndim == 3
    if batched:
        assert mre.ndim == 3, 'batched state needs batched matrix planes'
        bsz = x.shape[0]
        shape = [bsz] + shape
        block = [None] + block
        grid_axes = [bsz] + grid_axes

        def index_map(bid, *gids):
            out = [bid, 0]
            for i in range(kh):
                out.extend([gids[i], 0])
            out.extend([gids[kh], 0, 0])
            return tuple(out)

        mspec = pl.BlockSpec((None,) + mre.shape[1:],
                             lambda bid, *g: (bid,) + (0,) * (mre.ndim - 1),
                             memory_space=pltpu.SMEM)
    else:
        def index_map(*gids):
            out = [0]
            for i in range(kh):
                out.extend([gids[i], 0])
            out.extend([gids[kh], 0, 0])
            return tuple(out)

        mspec = pl.BlockSpec(mre.shape, lambda *g: (0,) * mre.ndim,
                             memory_space=pltpu.SMEM)

    xv = x.reshape(shape)
    kernel = functools.partial(
        _kernel_body, kh=kh, roll_info=roll_info, rb=rb,
        koff=kh + len(roll_info))

    spec = pl.BlockSpec(tuple(block), index_map, memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=tuple(grid_axes),
        out_shape=jax.ShapeDtypeStruct(tuple(shape), jnp.float32),
        in_specs=[spec, mspec, mspec],
        out_specs=spec,
        input_output_aliases={0: 0},
        interpret=interpret,
    )(xv, mre, mim)
    return y.reshape(x.shape)


def _grad_kernel_body(g_ref, x_ref, out_ref, *, kh, roll_info, rb):
    """Per-block partial matrix cotangents: out[0] = dmre, out[1] = dmim.

    dm[i,j] = sum_m g_i[m] * x_j[m] over non-gate positions, with
    dmre = gr xr + gi xi, dmim = gi xr - gr xi (see _bwd). Combo slices of g
    are read in place; combo slices of x materialize through the same
    XOR-roll machinery as the forward kernel.

    NOTE: Mosaic's tpu.matmul supports only a single contracting dim, so a
    naive stacked dot_general fails to lower; _grad_kernel_body_mxu
    (DQ_GRAD_MXU=1) works around it with a lane-contracting, sublane-batched
    dot_general + VPU epilogue. This body is the scalar-store VPU default.
    """
    KH = 1 << kh
    nr = len(roll_info)
    h_index, versions, masks, vrev = _block_machinery(kh, roll_info, rb)
    G = [[g_ref[(p,) + h_index(h)] for h in range(KH)] for p in range(2)]
    XV = [[versions(x_ref[(p,) + h_index(h)]) for h in range(KH)]
          for p in range(2)]
    _reduce_vpu(G, XV, out_ref, kh, nr, masks, vrev)


def _grad_kernel_body_mxu(g_ref, x_ref, out_ref, *, kh, roll_info, rb):
    """MXU variant of the cotangent reduction (VERDICT round-2 item: the VPU
    form's 2*K^2 scalar block-sums scale as ~4^K and make K=3 fusion lose to
    K=2 in training). All K masked-g combos and K rolled-x versions are
    stacked once, and the whole (K, K) reduction is four dot_generals with
    the lane axis contracting and the sublane axis as batch (Mosaic accepts
    a single contracting dim; sublanes reduce in a tiny VPU epilogue).

    Output is in VERSION space: out[.., i_out, (b<<nr)|v] holds the inner
    product with version v of slice b; the caller gathers columns through
    the vrev(lo^li) permutation (scalar scatters can't target VMEM, and the
    (K, K) tensor store requires VMEM, so the permutation moves outside).

    Enabled with DQ_GRAD_MXU=1. Measured (round-4 full 8-cell ablation,
    results.json grad_mxu_ablation_ms): NEUTRAL vs the VPU body at HIGHEST
    precision — 40.1-40.5 ms across every fused/mxu cell at K=2, 48.3-49.3
    at K=3. Default stays VPU; the K=3 cost this body targeted is instead
    removed by the window engine (ops/window_gate.py), which windows long
    runs out of the per-gate-pass regime entirely."""
    KH = 1 << kh
    nr = len(roll_info)
    h_index, versions, masks, _ = _block_machinery(kh, roll_info, rb)
    G = [[g_ref[(p,) + h_index(h)] for h in range(KH)] for p in range(2)]
    XV = [[versions(x_ref[(p,) + h_index(h)]) for h in range(KH)]
          for p in range(2)]
    _reduce_mxu(G, XV, out_ref, kh, nr, masks)


@functools.lru_cache(maxsize=None)
def _version_perm(kh: int, nr: int):
    """Column gather map from version space to matrix-index space:
    dm[i, (b<<nr)|li] = M[i, perm[i, (b<<nr)|li]], perm value (b<<nr)|vrev."""
    KH, nv = 1 << kh, 1 << nr
    K = KH * nv

    def vrev(v):
        return sum((((v >> (nr - 1 - bi)) & 1) << bi) for bi in range(nr))

    perm = np.empty((K, K), np.int64)
    for a in range(KH):
        for lo in range(nv):
            i = (a << nr) | lo
            for b in range(KH):
                for li in range(nv):
                    perm[i, (b << nr) | li] = (b << nr) | vrev(lo ^ li)
    return np.arange(K)[:, None], perm


def _use_mxu_grad() -> bool:
    import os
    return os.environ.get('DQ_GRAD_MXU', '0') == '1'


def _planar_grad(g, x, n: int, wires, interpret: bool = False):
    """Matrix-plane cotangents (dmre, dmim), each (K, K) f32 — or (B, K, K)
    for batched (B, 2, 2^n) inputs — via one Pallas reduction pass over g
    and x (no transposes, no big temporaries)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ws = sorted(wires)
    K = 1 << len(ws)
    kh, rb, roll_info, shape, grid_axes, block = _geometry(n, ws)
    batched = g.ndim == 3
    nblocks = int(np.prod(grid_axes))
    if batched:
        bsz = g.shape[0]
        shape = [bsz] + shape
        block = [None] + block
        full_grid = [bsz] + grid_axes

        def index_map(bid, *gids):
            out = [bid, 0]
            for i in range(kh):
                out.extend([gids[i], 0])
            out.extend([gids[kh], 0, 0])
            return tuple(out)

        def out_index(bid, *gids):
            flat = 0
            for i, ax in enumerate(grid_axes):
                flat = flat * ax + gids[i]
            return (bid * nblocks + flat, 0, 0, 0)
    else:
        bsz = None
        full_grid = grid_axes

        def index_map(*gids):
            out = [0]
            for i in range(kh):
                out.extend([gids[i], 0])
            out.extend([gids[kh], 0, 0])
            return tuple(out)

        def out_index(*gids):
            flat = 0
            for i, ax in enumerate(grid_axes):
                flat = flat * ax + gids[i]
            return (flat, 0, 0, 0)

    nout = nblocks if bsz is None else bsz * nblocks
    use_mxu = _use_mxu_grad()
    if use_mxu:
        kernel = functools.partial(_grad_kernel_body_mxu, kh=kh,
                                   roll_info=roll_info, rb=rb)
        # tensor (K, K) stores are fine in VMEM (only scalar stores are
        # SMEM-only); the version-space column gather happens below
        out_spec = pl.BlockSpec((1, 2, K, K), out_index, memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_grad_kernel_body, kh=kh,
                                   roll_info=roll_info, rb=rb)
        # scalar stores are an SMEM-only operation on TPU
        out_spec = pl.BlockSpec((1, 2, K, K), out_index, memory_space=pltpu.SMEM)
    spec = pl.BlockSpec(tuple(block), index_map, memory_space=pltpu.VMEM)
    parts = pl.pallas_call(
        kernel,
        grid=tuple(full_grid),
        out_shape=jax.ShapeDtypeStruct((nout, 2, K, K), jnp.float32),
        in_specs=[spec, spec],
        out_specs=out_spec,
        interpret=interpret,
    )(g.reshape(shape), x.reshape(shape))
    if batched:
        total = jnp.sum(parts.reshape(bsz, nblocks, 2, K, K), axis=1)
    else:
        total = jnp.sum(parts, axis=0)
    if use_mxu and len(roll_info) > 0:
        rows, perm = _version_perm(kh, len(roll_info))
        total = total[..., rows, perm]
    if batched:
        return total[:, 0], total[:, 1]
    return total[0], total[1]


def _bwd_fused_kernel_body(y_ref, g_ref, mre_ref, mim_ref,
                           x_ref, gout_ref, part_ref, *,
                           kh, roll_info, rb, use_mxu):
    """ONE backward pass per gate: x = U^H y (in place on y), matrix-plane
    cotangent partials <g, x-versions>, and g' = U^H g (in place on g).

    The unfused backward (_chain_bwd) launches three kernels per gate and
    moves 6 state-plane units of HBM traffic (R+W, 2R, R+W); this body does
    the same math in 4 units (2R + 2W) and one launch. The version/roll
    machinery (bit_vecs, masks, XOR partner selection) is computed once and
    shared by both applies and the reduction. mre/mim hold U^H planes in
    sorted-wire order."""
    KH = 1 << kh
    nr = len(roll_info)
    h_index, versions, masks, vrev = _block_machinery(kh, roll_info, rb)
    Y = [[versions(y_ref[(p,) + h_index(h)]) for h in range(KH)]
         for p in range(2)]
    G = [[versions(g_ref[(p,) + h_index(h)]) for h in range(KH)]
         for p in range(2)]
    X = _apply_combos(Y, mre_ref, mim_ref, kh, nr, masks, vrev)
    GO = _apply_combos(G, mre_ref, mim_ref, kh, nr, masks, vrev)
    for p in range(2):
        for a in range(KH):
            x_ref[(p,) + h_index(a)] = X[p][a]
            gout_ref[(p,) + h_index(a)] = GO[p][a]

    # cotangent reduction: raw g slices (version 0) against versions of the
    # freshly-recovered gate INPUT x
    G0 = [[G[p][h][0] for h in range(KH)] for p in range(2)]
    XV = [[versions(X[p][h]) for h in range(KH)] for p in range(2)]
    if use_mxu:
        _reduce_mxu(G0, XV, part_ref, kh, nr, masks)
    else:
        _reduce_vpu(G0, XV, part_ref, kh, nr, masks, vrev)


def _use_fused_bwd() -> bool:
    import os
    return os.environ.get('DQ_FUSED_BWD', '0') == '1'


def _planar_bwd_fused(y, g, mre_t, mim_t, n: int, wires, interpret: bool = False):
    """Fused backward step: returns (x, g_new, dmre, dmim) from one
    pallas_call. y and g are donated (aliased to x and g_new). Matrix
    planes are U^H in sorted-wire order; handles (B, 2, 2^n) batches as a
    grid axis like _planar_apply."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ws = sorted(wires)
    K = 1 << len(ws)
    kh, rb, roll_info, shape, grid_axes, block = _geometry(n, ws)
    if kh >= 3:
        # two live state blocks: halve RB so y + g fit VMEM double-buffered
        kh, rb, roll_info, shape, grid_axes, block = _geometry(
            n, ws, rb_bits_max=6)
    batched = y.ndim == 3
    nblocks = int(np.prod(grid_axes))
    if batched:
        bsz = y.shape[0]
        shape = [bsz] + shape
        block = [None] + block
        full_grid = [bsz] + grid_axes

        def index_map(bid, *gids):
            out = [bid, 0]
            for i in range(kh):
                out.extend([gids[i], 0])
            out.extend([gids[kh], 0, 0])
            return tuple(out)

        def out_index(bid, *gids):
            flat = 0
            for i, ax in enumerate(grid_axes):
                flat = flat * ax + gids[i]
            return (bid * nblocks + flat, 0, 0, 0)

        mspec = pl.BlockSpec((None,) + mre_t.shape[1:],
                             lambda bid, *gg: (bid,) + (0,) * (mre_t.ndim - 1),
                             memory_space=pltpu.SMEM)
    else:
        bsz = None
        full_grid = grid_axes

        def index_map(*gids):
            out = [0]
            for i in range(kh):
                out.extend([gids[i], 0])
            out.extend([gids[kh], 0, 0])
            return tuple(out)

        def out_index(*gids):
            flat = 0
            for i, ax in enumerate(grid_axes):
                flat = flat * ax + gids[i]
            return (flat, 0, 0, 0)

        mspec = pl.BlockSpec(mre_t.shape, lambda *gg: (0,) * mre_t.ndim,
                             memory_space=pltpu.SMEM)

    nout = nblocks if bsz is None else bsz * nblocks
    use_mxu = _use_mxu_grad()
    pspace = pltpu.VMEM if use_mxu else pltpu.SMEM
    part_spec = pl.BlockSpec((1, 2, K, K), out_index, memory_space=pspace)
    spec = pl.BlockSpec(tuple(block), index_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_fused_kernel_body, kh=kh,
                               roll_info=roll_info, rb=rb, use_mxu=use_mxu)
    x, g_new, parts = pl.pallas_call(
        kernel,
        grid=tuple(full_grid),
        out_shape=[jax.ShapeDtypeStruct(tuple(shape), jnp.float32),
                   jax.ShapeDtypeStruct(tuple(shape), jnp.float32),
                   jax.ShapeDtypeStruct((nout, 2, K, K), jnp.float32)],
        in_specs=[spec, spec, mspec, mspec],
        out_specs=[spec, spec, part_spec],
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(y.reshape(shape), g.reshape(shape), mre_t, mim_t)
    if batched:
        total = jnp.sum(parts.reshape(bsz, nblocks, 2, K, K), axis=1)
    else:
        total = jnp.sum(parts, axis=0)
    if use_mxu and len(roll_info) > 0:
        rows, perm = _version_perm(kh, len(roll_info))
        total = total[..., rows, perm]
    if batched:
        dre, dim = total[:, 0], total[:, 1]
    else:
        dre, dim = total[0], total[1]
    return x.reshape(y.shape), g_new.reshape(g.shape), dre, dim


def _mT(m):
    """Matrix transpose that leaves any leading batch axes alone."""
    return jnp.swapaxes(m, -1, -2)


def _sorted_mat_planes(matrix, wires):
    """Permute the complex gate matrix (2^k, 2^k), or a batch (B, 2^k, 2^k),
    from wires-list order to sorted-wire order and split into real planes
    (policy real dtype)."""
    from ..config import rdtype
    from .apply import permute_matrix_wires
    ws = list(wires)
    order = sorted(range(len(ws)), key=lambda i: ws[i])
    if order != list(range(len(ws))):
        if matrix.ndim == 3:
            matrix = jax.vmap(lambda m: permute_matrix_wires(m, order))(matrix)
        else:
            matrix = permute_matrix_wires(matrix, order)
    return (jnp.real(matrix).astype(rdtype()),
            jnp.imag(matrix).astype(rdtype()))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def planar_evolve(x, mre, mim, n: int, wires, interpret: bool = False):
    """Apply a k-wire unitary (planes mre/mim, sorted-wire order) to the
    planar state x = (2, 2^n) f32, in place on TPU. Differentiable; the
    backward recomputes the input from the output (unitarity), keeping the
    forward copy-free."""
    return _planar_apply(x, mre, mim, n, tuple(wires), interpret)


def _fwd(x, mre, mim, n, wires, interpret):
    y = _planar_apply(x, mre, mim, n, tuple(wires), interpret)
    return y, (y, mre, mim)


def _bwd(n, wires, interpret, res, g):
    """Three aliased kernel passes + one reduction pass, ordered so every
    in-place pallas_call can actually donate its input:

      x    = U^H y      (donates y — the residual is dead afterwards)
      dm   = <g, x>     (pure read of g and x; Pallas reduction kernel)
      dx   = U^H g      (donates g — nothing reads it after dm)

    Plane algebra: y = U x with yr = Ur xr - Ui xi, yi = Ur xi + Ui xr;
    dL/dUr[i,j] = sum gr_i xr_j + gi_i xi_j; dL/dUi[i,j] = sum gi_i xr_j
    - gr_i xi_j; dL/dx = Ur^T g_r-parts (implemented as the same kernel with
    planes (Ur^T, -Ui^T))."""
    y, mre, mim = res
    mre_t = _mT(mre)
    mim_t = -_mT(mim)
    if _use_fused_bwd():
        _, dx, dmre, dmim = _planar_bwd_fused(y, g, mre_t, mim_t, n,
                                              tuple(wires), interpret)
        return dx, dmre, dmim
    x = _planar_apply(y, mre_t, mim_t, n, tuple(wires), interpret)
    dmre, dmim = _planar_grad(g, x, n, tuple(wires), interpret)
    dx = _planar_apply(g, mre_t, mim_t, n, tuple(wires), interpret)
    return dx, dmre, dmim


planar_evolve.defvjp(_fwd, _bwd)


def planar_evolve_matrix(x, matrix, n: int, wires, interpret: bool = False):
    """Convenience entry: complex (2^k, 2^k) matrix in wires-list order."""
    mre, mim = _sorted_mat_planes(matrix, wires)
    return planar_evolve(x, mre, mim, n, tuple(wires), interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def planar_superop(x, mre, mim, n: int, wires, interpret: bool = False):
    """Apply a GENERAL (non-unitary) linear map to the planar state — same
    aliased kernel as planar_evolve, but the backward keeps the INPUT as the
    residual instead of un-applying by inversion (which assumes unitarity).
    Costs one state copy per call (XLA copies x before donating it into the
    aliased pallas_call). Used for density-matrix Kraus channels as 4^k
    superoperators on wire pairs (w, w+n) — circuit.py::_sim_planar_dm."""
    return _planar_apply(x, mre, mim, n, tuple(wires), interpret)


def _sop_fwd(x, mre, mim, n, wires, interpret):
    y = _planar_apply(x, mre, mim, n, tuple(wires), interpret)
    return y, (x, mre, mim)


def _sop_bwd(n, wires, interpret, res, g):
    """For y = M x (complex linear, possibly singular): dx = M^H g and the
    plane cotangents from <g, x> — the same plane algebra as the unitary
    _bwd, minus the inversion-based recompute."""
    x, mre, mim = res
    dmre, dmim = _planar_grad(g, x, n, tuple(wires), interpret)
    dx = _planar_apply(g, _mT(mre), -_mT(mim), n, tuple(wires), interpret)
    return dx, dmre, dmim


planar_superop.defvjp(_sop_fwd, _sop_bwd)


def planar_superop_matrix(x, matrix, n: int, wires, interpret: bool = False):
    """Convenience entry: complex (2^k, 2^k) map in wires-list order."""
    mre, mim = _sorted_mat_planes(matrix, wires)
    return planar_superop(x, mre, mim, n, tuple(sorted(wires)), interpret)


# ----------------------------------------------------- wire-relabel schedule
_ROT_MIN_BITS = 7      # both runs of the rotation transpose >= 128 elements
_ROLL_LIMIT = _T_BITS + _RB_BITS_MAX   # positions with bit < this need rolls


def _rotate_planar(x, delta: int, n: int):
    """Cyclically rotate qubit POSITIONS of a planar state left by delta:
    the wire at position delta moves to position 0 ((…, 2, 2^n) -> same).

    Implemented as a 2-run grouped transpose. Legal deltas keep BOTH runs
    >= 2^7 elements: TPU tiles the last two dims, and a short final dim is
    catastrophic (measured 10 GB/s for a 4-lane final dim vs 255-540 GB/s
    for 128+-lane runs — benchmarks/probe_transpose.py)."""
    delta %= n
    if delta == 0:
        return x
    lead = x.shape[:-1]
    v = x.reshape(lead + (1 << delta, 1 << (n - delta)))
    v = jnp.swapaxes(v, -1, -2)
    return v.reshape(x.shape)


def _rot_legal(delta: int, n: int) -> bool:
    delta %= n
    return delta == 0 or _ROT_MIN_BITS <= delta <= n - _ROT_MIN_BITS


def _roll_count(pw, n: int) -> int:
    """Mid/tail positions in a physical wire set (they need sublane/lane
    rolls in the kernel; arithmetic grows 2^nr-fold)."""
    return sum(1 for p in pw if (n - 1 - p) < _ROLL_LIMIT)


def _gate_cost(pw, n: int) -> float:
    """Relative pass cost by roll count (measured at n=24 on a v5e:
    nr<=1 ~0.34-0.46 ms, nr=2 ~1.2-1.6 ms, nr=3 ~2.7-3.2 ms; see
    benchmarks/probe_wireclass.py)."""
    nr = _roll_count(pw, n)
    return (1.0, 1.0, 3.5, 7.0)[min(nr, 3)]


_ROT_COST = 2.0        # relabel transpose ~1-2 gate passes (probe_transpose)
_LOOKAHEAD = 24        # groups simulated when scoring a candidate rotation


def _rot_path(cur: int, target: int, n: int):
    """Shortest sequence of LEGAL rotation deltas moving the labeling from
    cur to target (BFS over compositions, depth <= 4 — sums of <= 3 legal
    deltas already cover every residue for n >= 14). None if unreachable."""
    net = (target - cur) % n
    if net == 0:
        return []
    legal = range(_ROT_MIN_BITS, n - _ROT_MIN_BITS + 1)
    frontier = {0: []}
    for _ in range(4):
        nxt = {}
        for got, path in frontier.items():
            for d in legal:
                g2 = (got + d) % n
                if g2 == net:
                    return path + [d]
                if g2 not in nxt:
                    nxt[g2] = path + [d]
        frontier = nxt
    return None


def schedule_rotations(wires_list, n: int):
    """Trace-time relabel scheduler for planar gate chains.

    Measured motivation (benchmarks/probe_wireclass.py, probe_transpose.py,
    v5e n=24): gate groups with >= 2 mid/tail wires run 3-7x below the HBM
    roofline — the kernel's masked low-bit combination does 2^nr-fold more
    VPU arithmetic and compute, not memory, becomes the bound — while a
    cyclic relabel transpose costs ~1-2 gate passes. So keep every group at
    <= 1 roll wire by rotating the qubit labeling as the gate stream drifts
    out of the head region: the on-chip analog of the distributed engine's
    global/local qubit exchange (arXiv:2311.01512; reference
    distributed.py's swap algorithms play this role across ranks).

    Returns (plan, changed): plan entries are ('rot', delta) or
    ('gate', idx, phys_wires) with phys_wires in the SAME element order as
    wires_list[idx]. The plan always closes rotated back to the identity
    labeling, so callers and observables see logical wire order. changed is
    False when no rotation was worth emitting (plan is then gate-only).
    """
    H = n - _ROLL_LIMIT                   # head positions [0, H)
    if H < 2 or n < 2 * _ROT_MIN_BITS:
        return ([('gate', i, tuple(ws)) for i, ws in enumerate(wires_list)],
                False)

    def sim_cost(rot, start, budget):
        """Greedy cost of the next `budget` groups under labeling `rot`,
        without further relabels (scoring heuristic)."""
        c = 0.0
        for ws in wires_list[start:start + budget]:
            c += _gate_cost([(w - rot) % n for w in ws], n)
        return c

    rot = 0
    plan = []
    changed = False
    for idx, ws in enumerate(wires_list):
        pw = [(w - rot) % n for w in ws]
        if _roll_count(pw, n) >= 2:
            # candidate labelings: each group wire (minus a small back-off)
            # at position 0; scored over a lookahead window
            cands = {(w - back) % n for w in ws for back in range(min(H, 3))}
            best = (sim_cost(rot, idx, _LOOKAHEAD), rot, [])
            for cand in cands:
                path = _rot_path(rot, cand, n)
                if not path:
                    continue
                if _rot_path(cand, 0, n) is None:
                    # a labeling the plan could not close from (possible at
                    # small odd n where legal deltas are sparse) would trip
                    # the closing assert below — never move there
                    continue
                cost = _ROT_COST * len(path) + sim_cost(cand, idx, _LOOKAHEAD)
                if cost < best[0] - 1e-9:
                    best = (cost, cand, path)
            _, cand, path = best
            for d in path:
                plan.append(('rot', d))
                changed = True
            rot = cand
            pw = [(w - rot) % n for w in ws]
        plan.append(('gate', idx, tuple(pw)))
    closing = _rot_path(rot, 0, n)
    assert closing is not None, f'no legal closing rotation from {rot} (n={n})'
    for d in closing:
        plan.append(('rot', d))
    return plan, changed


def _use_sched() -> bool:
    import os
    return os.environ.get('DQ_SCHED', '1') != '0'


# ------------------------------------------- reverse-differentiable kernels
# The raw pallas_calls (_planar_apply, _planar_grad, window_apply) have no
# AD rules, so the chain VJP below is opaque to SECOND-order reverse mode:
# jax.jacrev(jax.grad(f)) must differentiate _chain_bwd's graph. These thin
# custom_vjp wrappers close the derivative algebra over the SAME two kernel
# entry points —
#
#     VJP of apply(x, M):   dx = apply(g, M^H),   dM = grad_reduce(g, x)
#     VJP of grad_reduce:   dg = apply(x, C),     dx = apply(g, C^H)
#
# (C = the (K, K) cotangent planes; no unitarity is assumed anywhere, the
# M^H in the apply VJP is the real-Jacobian transpose of the plane algebra,
# exact for arbitrary M). Because each rule is expressed in the wrappers
# themselves, reverse mode composes to ANY order. First-order behavior is
# untouched: in a non-AD trace a custom_vjp call inlines the primal
# function, so the chain's forward/backward HLO is byte-identical.
# Forward-mode (jax.hessian = jacfwd . jacrev) still cannot cross
# custom_vjp — QubitCircuit.hessian uses rev-over-rev for exactly this
# reason (reference metric: benchmark_v420/hessian/hessian_deepquantum.py).

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _applyd(x, mre, mim, n, wires, interpret=False):
    return _planar_apply(x, mre, mim, n, wires, interpret)


def _applyd_fwd(x, mre, mim, n, wires, interpret):
    return _planar_apply(x, mre, mim, n, wires, interpret), (x, mre, mim)


def _applyd_bwd(n, wires, interpret, res, g):
    x, mre, mim = res
    dx = _applyd(g, _mT(mre), -_mT(mim), n, wires, interpret)
    dmre, dmim = _gradd(g, x, n, wires, interpret)
    return dx, dmre, dmim


_applyd.defvjp(_applyd_fwd, _applyd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gradd(g, x, n, wires, interpret=False):
    return _planar_grad(g, x, n, wires, interpret)


def _gradd_fwd(g, x, n, wires, interpret):
    return _planar_grad(g, x, n, wires, interpret), (g, x)


def _gradd_bwd(n, wires, interpret, res, ct):
    g, x = res
    cr, ci = ct
    dg = _applyd(x, cr, ci, n, wires, interpret)
    dx = _applyd(g, _mT(cr), -_mT(ci), n, wires, interpret)
    return dg, dx


_gradd.defvjp(_gradd_fwd, _gradd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _winapplyd(x, mre, mim, n, w, interpret=False):
    from .window_gate import window_apply
    return window_apply(x, mre, mim, n, w, interpret)


def _winapplyd_fwd(x, mre, mim, n, w, interpret):
    from .window_gate import window_apply
    return window_apply(x, mre, mim, n, w, interpret), (x, mre, mim)


def _winapplyd_bwd(n, w, interpret, res, g):
    from .window_gate import window_apply, window_grad
    x, mre, mim = res
    dx = _winapplyd(g, _mT(mre), -_mT(mim), n, w, interpret)
    dmre, dmim = window_grad(g, x, n, w)   # pure jnp — differentiable
    return dx, dmre, dmim


_winapplyd.defvjp(_winapplyd_fwd, _winapplyd_bwd)


# --------------------------------------------------------------- gate chains
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def planar_chain(x, mres, mims, n: int, wires_seq, interpret: bool = False):
    """Apply a whole sequence of unitaries in place with O(1) memory.

    Under plain jax.grad, every per-gate output would be saved as a residual,
    keeping it alive and forcing XLA to copy the state before each aliased
    kernel (measured ~2.4x on the n=22 VQE step). This chain-level custom
    VJP is the adjoint-method fix (arXiv:2009.02823, reference adjoint.py):
    the forward stores only the FINAL state; the backward walks gates in
    reverse, un-applying each unitary to recover its input (U^H y), reducing
    the matrix cotangent with the Pallas grad kernel, and propagating the
    state cotangent (U^H g) — every pass donates its buffer.

    mres/mims: tuples of (K_i, K_i) f32 planes in sorted-wire order;
    wires_seq: tuple of sorted wire tuples — or ('rot', delta) relabel
    entries from schedule_rotations (their mres/mims slots hold (1, 1)
    zero placeholders to keep the pytrees aligned; rotations are constant
    permutations, so their matrix cotangents are zero).

    When the whole sequence is windows + relabels and the state fits VMEM
    (n <= 19), the chain collapses into ONE launch per direction — the
    VMEM-resident engine of ops/chain_kernel.py (measured motivation in its
    header: pass count stopped mattering at n18, HBM round trips were the
    bound).
    """
    from .chain_kernel import chain_fused_ok, window_chain_fwd
    if x.dtype == jnp.float32 and chain_fused_ok(wires_seq, n, mres):
        return window_chain_fwd(x, mres, mims, n, wires_seq, interpret)
    for mre, mim, ws in zip(mres, mims, wires_seq):
        if ws[0] == 'rot':
            x = _rotate_planar(x, ws[1], n)
        elif ws[0] == 'win':
            from .window_gate import window_apply
            x = window_apply(x, mre, mim, n, ws[1], interpret)
        else:
            x = _planar_apply(x, mre, mim, n, ws, interpret)
    return x


def _chain_fwd(x, mres, mims, n, wires_seq, interpret):
    y = planar_chain(x, mres, mims, n, wires_seq, interpret)
    return y, (y, mres, mims)


def _chain_bwd(n, wires_seq, interpret, res, g):
    y, mres, mims = res
    from .chain_kernel import chain_fused_ok, window_chain_bwd
    if y.dtype == jnp.float32 and chain_fused_ok(wires_seq, n, mres):
        _, g_in, dres, dims = window_chain_bwd(y, g, mres, mims, n,
                                               wires_seq, interpret)
        return g_in, dres, dims
    fused = _use_fused_bwd()
    dres = [None] * len(mres)
    dims = [None] * len(mres)
    for i in range(len(mres) - 1, -1, -1):
        if wires_seq[i][0] == 'rot':
            # un-rotate state and cotangent; a relabel is a constant
            # permutation, so its matrix cotangent is zero
            y = _rotate_planar(y, -wires_seq[i][1], n)
            g = _rotate_planar(g, -wires_seq[i][1], n)
            dres[i] = jnp.zeros_like(mres[i])
            dims[i] = jnp.zeros_like(mims[i])
            continue
        if wires_seq[i][0] == 'win':
            # dense window: recompute input (W^H y), window-plane cotangent
            # via two MXU matmuls, then propagate g = W^H g; autodiff
            # carries dW back through the embedding product to gate params.
            # _winapplyd (not raw window_apply) keeps this backward graph
            # reverse-differentiable for second-order (QubitCircuit.hessian)
            from .window_gate import window_grad
            w = wires_seq[i][1]
            wre_t = _mT(mres[i])
            wim_t = -_mT(mims[i])
            x = _winapplyd(y, wre_t, wim_t, n, w, interpret)
            dres[i], dims[i] = window_grad(g, x, n, w)
            g = _winapplyd(g, wre_t, wim_t, n, w, interpret)
            y = x
            continue
        mre_t = _mT(mres[i])
        mim_t = -_mT(mims[i])
        if fused:
            # single-launch fused backward: first-order only (no VJP rule;
            # DQ_FUSED_BWD defaults off — see grad_mxu_ablation_ms)
            y, g, dres[i], dims[i] = _planar_bwd_fused(
                y, g, mre_t, mim_t, n, wires_seq[i], interpret)
        else:
            x = _applyd(y, mre_t, mim_t, n, wires_seq[i], interpret)
            dres[i], dims[i] = _gradd(g, x, n, wires_seq[i], interpret)
            g = _applyd(g, mre_t, mim_t, n, wires_seq[i], interpret)
            y = x
    return g, tuple(dres), tuple(dims)


planar_chain.defvjp(_chain_fwd, _chain_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def planar_pauli_expectation(x, mres, mims, n: int, wires_seq, interpret: bool = False):
    """Re<x|P|x> for a Hermitian Pauli-string P given as a chain of constant
    k<=3-wire blocks. Forward: one kernel chain computes Px (x is copied once
    since it stays live for the inner product); backward: d/dx = 2 g * (Px)
    — a single elementwise pass, with Px reused from the forward residual.
    Matrix cotangents are zero (observables are constants). ('rot', delta)
    relabel entries are allowed — schedule_rotations plans close back to the
    identity labeling, so Px ends aligned with x for the inner product."""
    ox = _pexp_chain(x, mres, mims, n, wires_seq, interpret)
    return jnp.sum(x[..., 0, :] * ox[..., 0, :] + x[..., 1, :] * ox[..., 1, :],
                   axis=-1)


def _pexp_chain(x, mres, mims, n, wires_seq, interpret):
    # _applyd/_winapplyd (identical primal HLO) keep the residual path of
    # _pexp_fwd reverse-differentiable for second order: jacrev of the
    # expectation's VJP pulls cotangents back through ox = P x.
    # The VMEM-resident one-launch path (chain_kernel.py) applies when the
    # sequence qualifies — QubitCircuit.hessian pins DQ_CHAIN_FUSED=0, so
    # second-order traces never see it.
    from .chain_kernel import chain_fused_ok, window_chain_fwd
    if x.dtype == jnp.float32 and chain_fused_ok(wires_seq, n, mres):
        return window_chain_fwd(x, mres, mims, n, wires_seq, interpret)
    ox = x
    for mre, mim, ws in zip(mres, mims, wires_seq):
        if ws[0] == 'rot':
            ox = _rotate_planar(ox, ws[1], n)
        elif ws[0] == 'win':
            ox = _winapplyd(ox, mre, mim, n, ws[1], interpret)
        else:
            ox = _applyd(ox, mre, mim, n, ws, interpret)
    return ox


def _pexp_fwd(x, mres, mims, n, wires_seq, interpret):
    ox = _pexp_chain(x, mres, mims, n, wires_seq, interpret)
    e = jnp.sum(x[..., 0, :] * ox[..., 0, :] + x[..., 1, :] * ox[..., 1, :],
                axis=-1)
    return e, (ox, mres, mims)


def _pexp_bwd(n, wires_seq, interpret, res, g):
    ox, mres, mims = res
    dx = 2.0 * jnp.asarray(g)[..., None, None] * ox
    zr = tuple(jnp.zeros_like(m) for m in mres)
    zi = tuple(jnp.zeros_like(m) for m in mims)
    return dx, zr, zi


planar_pauli_expectation.defvjp(_pexp_fwd, _pexp_bwd)


def _combo_view(x, n: int, ws):
    """(2, 2^n) planes -> (2, 2^k, M) with the k sorted wires' bit
    combinations as the middle axis (row order = sorted-wire order).
    Returns (combos, restore) where restore maps a same-shaped combo
    array back to (2, 2^n)."""
    k = len(ws)
    shape = [2]
    axes = []
    prev = -1
    for w in ws:
        shape.append(1 << (w - prev - 1))
        shape.append(2)
        axes.append(len(shape) - 1)
        prev = w
    shape.append(1 << (n - 1 - prev))
    xv = x.reshape(shape)
    rest = [i for i in range(1, len(shape)) if i not in axes]
    xv = jnp.transpose(xv, [0] + axes + rest)
    pshape = xv.shape
    inv = np.argsort([0] + axes + rest)

    def restore(y):
        return jnp.transpose(y.reshape(pshape), inv).reshape(x.shape)

    return xv.reshape(2, 1 << k, -1), restore


def planar_evolve_xla(x, mre, mim, n: int, wires):
    """Planar gate apply in plain XLA (real matmuls) — the fallback used
    where the Pallas kernel does not apply (n < 10, odd shapes, non-f32).
    Matrix planes are in SORTED-wire order, matching planar_evolve."""
    xv, restore = _combo_view(x, n, sorted(wires))
    hp = jax.lax.Precision.HIGHEST
    yr = (jnp.matmul(mre, xv[0], precision=hp)
          - jnp.matmul(mim, xv[1], precision=hp))
    yi = (jnp.matmul(mre, xv[1], precision=hp)
          + jnp.matmul(mim, xv[0], precision=hp))
    return restore(jnp.stack([yr, yi]))


def planar_grad_xla(g, x, n: int, wires):
    """Matrix-plane cotangents (dmre, dmim) in plain XLA — fallback twin of
    _planar_grad. dmre[i,j] = sum_m gr_i[m] xr_j[m] + gi_i[m] xi_j[m];
    dmim[i,j] = sum_m gi_i[m] xr_j[m] - gr_i[m] xi_j[m]."""
    ws = sorted(wires)
    gv, _ = _combo_view(g, n, ws)
    xv, _ = _combo_view(x, n, ws)
    hp = jax.lax.Precision.HIGHEST
    dmre = (jnp.matmul(gv[0], xv[0].T, precision=hp)
            + jnp.matmul(gv[1], xv[1].T, precision=hp))
    dmim = (jnp.matmul(gv[1], xv[0].T, precision=hp)
            - jnp.matmul(gv[0], xv[1].T, precision=hp))
    return dmre, dmim


def apply_raw(x, mre, mim, n: int, wires, use_pallas: bool, interpret: bool = False):
    """Undifferentiated single-gate planar apply: Pallas kernel when allowed
    and supported, XLA matmul fallback otherwise. For use INSIDE chain-level
    custom VJPs (the per-gate custom VJP of planar_evolve must not nest)."""
    ws = tuple(sorted(wires))
    if use_pallas and planar_supported(n, ws) and x.dtype == jnp.float32:
        return _planar_apply(x, mre, mim, n, ws, interpret)
    return planar_evolve_xla(x, mre, mim, n, ws)


def grad_raw(g, x, n: int, wires, use_pallas: bool, interpret: bool = False):
    """Undifferentiated matrix-cotangent reduction: Pallas when allowed."""
    ws = tuple(sorted(wires))
    if use_pallas and planar_supported(n, ws) and g.dtype == jnp.float32:
        return _planar_grad(g, x, n, ws, interpret)
    return planar_grad_xla(g, x, n, ws)


def bwd_fused_raw(y, g, mre_t, mim_t, n: int, wires, use_pallas: bool,
                  interpret: bool = False):
    """One backward gate step (x, g', dmre, dmim): the fused single-launch
    kernel when enabled (DQ_FUSED_BWD) and supported, else the 3-op path."""
    ws = tuple(sorted(wires))
    if (use_pallas and _use_fused_bwd() and planar_supported(n, ws)
            and y.dtype == jnp.float32):
        return _planar_bwd_fused(y, g, mre_t, mim_t, n, ws, interpret)
    x = apply_raw(y, mre_t, mim_t, n, ws, use_pallas, interpret)
    dmre, dmim = grad_raw(g, x, n, ws, use_pallas, interpret)
    g = apply_raw(g, mre_t, mim_t, n, ws, use_pallas, interpret)
    return x, g, dmre, dmim


def planar_evolve_any(x, mre, mim, n: int, wires, interpret: bool = False):
    """Kernel when supported, XLA fallback otherwise (same semantics)."""
    ws = tuple(sorted(wires))
    if planar_supported(n, ws):
        return planar_evolve(x, mre, mim, n, ws, interpret)
    return planar_evolve_xla(x, mre, mim, n, ws)


def schedule_planar_seq(mres, mims, wseq, n: int):
    """Insert relabel rotations (schedule_rotations) into an already-sorted
    planar chain spec. mres/mims: per-gate planes in sorted-LOGICAL-wire
    order ((K, K) or batched (B, K, K)); wseq: sorted logical wire tuples.
    Returns (mres', mims', wseq') where wseq' interleaves ('rot', delta)
    entries (with (1, 1) zero plane placeholders) and each gate's planes are
    re-permuted to sorted-PHYSICAL order under the labeling in effect.

    When the MXU window engine is enabled (DQ_WINDOW, ops/window_gate.py)
    and applicable, gate RUNS are instead collapsed into dense 2^w x 2^w
    window unitaries (('win', w) entries) — one matmul sweep per run."""
    if not _use_sched():
        return mres, mims, wseq
    from .window_gate import _use_window, schedule_window_seq
    if _use_window():
        win = schedule_window_seq(mres, mims, wseq, n)
        if win is not None:
            return win
    plan, changed = schedule_rotations(list(wseq), n)
    if not changed:
        return mres, mims, wseq
    from .apply import permute_matrix_wires
    out_r, out_i, out_w = [], [], []
    dummy = jnp.zeros((1, 1), mres[0].dtype if mres else jnp.float32)
    for ent in plan:
        if ent[0] == 'rot':
            out_r.append(dummy)
            out_i.append(dummy)
            out_w.append(('rot', ent[1]))
            continue
        _, i, pw = ent
        mre, mim = mres[i], mims[i]
        order = sorted(range(len(pw)), key=lambda j: pw[j])
        if order != list(range(len(pw))):
            if mre.ndim == 3:
                mre = jax.vmap(lambda m: permute_matrix_wires(m, order))(mre)
                mim = jax.vmap(lambda m: permute_matrix_wires(m, order))(mim)
            else:
                mre = permute_matrix_wires(mre, order)
                mim = permute_matrix_wires(mim, order)
        out_r.append(mre)
        out_i.append(mim)
        out_w.append(tuple(sorted(pw)))
    return tuple(out_r), tuple(out_i), tuple(out_w)


def planar_chain_matrices(x, matrices, wires_list, n: int, interpret: bool = False):
    """Chain entry point for complex matrices in wires-list order. Applies
    the relabel schedule (schedule_rotations) before launching the chain."""
    mres, mims, wseq = [], [], []
    for mat, ws in zip(matrices, wires_list):
        mre, mim = _sorted_mat_planes(mat, ws)
        mres.append(mre)
        mims.append(mim)
        wseq.append(tuple(sorted(ws)))
    mres, mims, wseq = schedule_planar_seq(tuple(mres), tuple(mims),
                                           tuple(wseq), n)
    return planar_chain(x, tuple(mres), tuple(mims), n, tuple(wseq), interpret)
