"""End-to-end smoke check of every subsystem on the attached accelerator.

Drives eight user-facing surfaces (VQE training, MPS GHZ, boson sampling,
Gaussian photon statistics, bosonic homodyne, TDM, circuit cutting, MBQC)
through the public API and asserts physical invariants. Exit 0 = all pass.

Run: python benchmarks/tpu_smoke.py   (TPU if attached, else CPU)
"""
import sys, time; sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))
import jax, jax.numpy as jnp
import numpy as np
import optax
import deepquantum_tpu as dq
from deepquantum_tpu.photonic import QumodeCircuit
from deepquantum_tpu.photonic.tdm import QumodeCircuitTDM
from deepquantum_tpu.utils.compat import to_numpy

ok = []
# 1. qubit VQE training converges + state normalized
vqe = dq.QubitCircuit(8)
for _ in range(3):
    for i in range(8):
        vqe.rx(i); vqe.rz(i)
    vqe.cnot_ring()
vqe.observable(0)
params = vqe.params
opt = optax.adam(0.1); st = opt.init(params)
@jax.jit
def step(p, s):
    v, g = jax.value_and_grad(lambda q: vqe.expectation(params=q)[0])(p)
    u, s = opt.update(g, s)
    return optax.apply_updates(p, u), s, v
for _ in range(80):
    params, st, v = step(params, st)
state = to_numpy(vqe.forward(params=params))
norm = np.linalg.norm(state)
ok.append(('vqe', float(v) < -0.98 and abs(norm - 1) < 1e-5, f'E={float(v):.4f} norm={norm:.7f}'))

# 2. MPS 16-qubit GHZ
mps = dq.QubitCircuit(16, mps=True, chi=16)
mps.h(0)
for i in range(15):
    mps.cnot(i, i+1)
mps()
res = mps.measure(shots=64)
ok.append(('mps', set(res) <= {'0'*16, '1'*16}, str({k[:3] for k in res})))

# 3. boson sampling probs sum
bs = QumodeCircuit(nmode=3, init_state=[1,1,0], cutoff=3, backend='fock', basis=True)
bs.ps(0, inputs=0.3); bs.bs([0,1], inputs=[0.4,0.5]); bs.mzi([1,2], inputs=[0.6,0.7])
probs = bs(is_prob=True)
tot = sum(float(np.asarray(p)) for p in probs.values())
ok.append(('boson_sampling', 0.97 < tot <= 1.001, f'sum={tot:.5f}'))

# 4. GBS + photon stats
g = QumodeCircuit(nmode=2, init_state='vac', cutoff=4, backend='gaussian')
g.s(0, r=0.4); g.s(1, r=0.3); g.bs([0,1], inputs=[0.6,0.2])
g()
exp, _ = g.photon_number_mean_var()
total_n = float(np.asarray(exp).sum())
expect_n = np.sinh(0.4)**2 + np.sinh(0.3)**2
ok.append(('gaussian', abs(total_n - expect_n) < 1e-4, f'n={total_n:.5f} vs {expect_n:.5f}'))

# 5. bosonic cat + homodyne
b = QumodeCircuit(nmode=1, init_state='vac', cutoff=4, backend='bosonic')
b.cat(0, r=1.0, theta=0.0, p=0)
b.homodyne_x(0)
b()
s = np.asarray(b.measure_homodyne(shots=4))
ok.append(('bosonic', np.isfinite(s).all(), str(np.round(s, 3))))

# 6. TDM
t = QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
t.s(0, r=0.5); t.delay(0, ntau=1, inputs=(0.4, 0.2)); t.homodyne_x(0)
t(nstep=3)
ok.append(('tdm', np.isfinite(np.asarray(t.samples)).all(), str(np.asarray(t.samples).round(3))))

# 7. cutting reconstruction
cut = dq.QubitCircuit(2)
cut.rx(0, inputs=0.3); cut.cnot(0, 1); cut.cut(1); cut.ry(1, inputs=0.7)
cut.observable(1)
uncut_e = float(cut.expectation()[0])
subs, coeffs = cut.get_subexperiments()
total = 0
for k in range(len(coeffs)):
    prod = 1.0
    for label in subs:
        c = subs[label][k]
        if c.observables:
            c()
            prod *= float(np.prod(np.asarray(c.expectation())))
    total += coeffs[k] * prod
ok.append(('cutting', abs(total - uncut_e) < 1e-4, f'{total:.5f} vs {uncut_e:.5f}'))

# 8. MBQC transpile
mb = dq.QubitCircuit(2)
mb.h(0); mb.cnot(0, 1)
pattern = mb.pattern()
graph = pattern()
st8 = np.asarray(to_numpy(graph.full_state)).reshape(-1)
target = np.zeros(4, complex); target[0] = target[3] = 2**-0.5
fid = abs(np.vdot(st8, target))
ok.append(('mbqc', fid > 1 - 1e-5, f'fidelity={fid:.6f}'))

# 9. density-matrix noisy circuit on the planar route (rho = 2n-qubit planes)
import os
dm = dq.QubitCircuit(6, den_mat=True)
for i in range(6):
    dm.rx(i)
dm.cnot_ring()
dm.bit_flip(0, inputs=0.05)
for i in range(6):
    dm.ry(i)
dm.observable(0)
dm_planar = dm._planar_ok()
planar_expected = jax.default_backend() == 'tpu'   # CPU runs take the einsum route
p0 = dm.params
g_dm = np.asarray(to_numpy(jax.jit(jax.grad(
    lambda q: dm.expectation(params=q)[0]))(p0)))
rho = np.asarray(to_numpy(dm(params=p0)))
tr = float(np.real(np.trace(rho)))
ok.append(('denmat_planar', dm_planar == planar_expected and abs(tr - 1) < 1e-5
           and np.isfinite(g_dm).all(), f'planar={dm_planar} tr={tr:.6f}'))

# 10. fused single-launch backward matches the default backward
fv = dq.QubitCircuit(12)
for i in range(12):
    fv.ry(i)
fv.cnot_ring()
fv.observable(0)
pf = fv.params
g_def = np.asarray(to_numpy(jax.jit(jax.grad(
    lambda q: fv.expectation(params=q)[0]))(pf)))
os.environ['DQ_FUSED_BWD'] = '1'
fv2 = dq.QubitCircuit(12)
for i in range(12):
    fv2.ry(i)
fv2.cnot_ring()
fv2.observable(0)
g_fus = np.asarray(to_numpy(jax.jit(jax.grad(
    lambda q: fv2.expectation(params=q)[0]))(pf)))
os.environ.pop('DQ_FUSED_BWD', None)
diff = float(np.abs(g_fus - g_def).max())
ok.append(('fused_bwd', diff < 1e-5, f'max grad diff={diff:.2e}'))

print()
for name, passed, info in ok:
    print(f'{"PASS" if passed else "FAIL":4} {name:16} {info}')
sys.exit(0 if all(p for _, p, _ in ok) else 1)
