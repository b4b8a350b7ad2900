"""Correctness + timing of the single-read big-K wsum vs two-pass and ref."""
import time, numpy as np, jax, jax.numpy as jnp
import pymbar_tpu
from pymbar_tpu.ops.doubledouble import dd_from_f64
from pymbar_tpu.ops import pallas_kernels as pk

def dd_to_f64(h, l):
    return np.asarray(h, np.float64) + np.asarray(l, np.float64)

# small correctness check: K=2500 (pads to 4096), N=1000 (pads), with counts
rng = np.random.default_rng(0)
K, N = 2500, 1000
u64 = jnp.asarray(rng.standard_normal((K, N)) * 3.0 + 5.0)
uh = u64.astype(jnp.float32); ul = (u64 - uh.astype(jnp.float64)).astype(jnp.float32)
g64 = jnp.asarray(rng.standard_normal(K) * 0.5)
gh, gl = dd_from_f64(g64)
c = jnp.asarray(rng.integers(0, 4, N).astype(np.float32))

for fast in (True, False):
    S_ref = dd_to_f64(*pk.wsum_dd_ref(uh, ul, gh, gl))
    S_new = dd_to_f64(*pk.wsum_dd(uh, ul, gh, gl, fast=fast))
    err = np.max(np.abs(S_new - S_ref) / np.maximum(S_ref, 1e-30))
    print(f"unweighted fast={fast} rel_err={err:.3e}")
    Sc_ref = dd_to_f64(*pk.wsum_dd_ref(uh, ul, gh, gl, c=c))
    Sc_new = dd_to_f64(*pk.wsum_dd(uh, ul, gh, gl, c=c, fast=fast))
    errc = np.max(np.abs(Sc_new - Sc_ref) / np.maximum(Sc_ref, 1e-30))
    print(f"weighted   fast={fast} rel_err={errc:.3e}")

# timing at the bench stress shape
K4, N4 = 4096, 1 << 18
u = jnp.asarray(rng.standard_normal((K4, N4)).astype(np.float32) * 3.0)
ul4 = jnp.zeros_like(u)
g = jnp.zeros(K4, jnp.float32); gl4 = jnp.zeros_like(g)
def _fence(x):
    float(np.asarray(x[0][0] if isinstance(x, tuple) else x[0]))

out = pk.wsum_dd(u, ul4, g, gl4); _fence(out)
t0 = time.time()
for _ in range(3):
    out = pk.wsum_dd(u, ul4, g, gl4)
_fence(out)
dt = (time.time() - t0) / 3
print(f"single-read: {dt*1e3:.1f} ms = {K4*N4*8/dt/1e9:.1f} GB/s")

# two-pass for comparison (direct call)
m_n = jnp.max(g[:, None] - u, axis=0)
dh, dl = pk.denom_sums_dd(u, ul4, g, gl4, m_n)
out2 = pk.wsum_denom_dd(u, ul4, g, gl4, m_n, dh, dl); _fence(out2)
def twopass():
    m_n = jnp.max(g[:, None] - u, axis=0)
    dh, dl = pk.denom_sums_dd(u, ul4, g, gl4, m_n)
    return pk.wsum_denom_dd(u, ul4, g, gl4, m_n, dh, dl)
t0 = time.time()
for _ in range(3):
    out2 = twopass()
_fence(out2)
dt2 = (time.time() - t0) / 3
print(f"two-pass:    {dt2*1e3:.1f} ms = {K4*N4*8/dt2/1e9:.1f} GB/s")
