"""Probe: decompose the batched-bootstrap exact sweep (1.09 s at the 8 GB
config). Times (a) the f64 dot pair at production chunk shapes, (b) the
same contraction as f32-operand matmuls with preferred_element_type=f64
(split-operand scheme: products exact in f64, f64 accumulation), and
(c) checks the split scheme's accuracy against f64."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import pymbar_tpu  # config: x64 on
import jax, jax.numpy as jnp

B, K, NC = 64, 1024, 16384
NCHUNKS = 61

rng = np.random.default_rng(0)
R = jnp.asarray(np.exp(rng.uniform(-0.1, 0.1, (B, K))))          # f64
th = jnp.asarray(rng.uniform(0.1, 1.0, (K, NC)), jnp.float32)
tl = jnp.asarray(rng.uniform(-1, 1, (K, NC)) * 3e-8, jnp.float32)
C = jnp.asarray(rng.poisson(1.0, (B, NC)), jnp.float32)

dim_bk_kn = (((1,), (0,)), ((), ()))
dim_bn_kn = (((1,), (1,)), ((), ()))

@jax.jit
def pair_f64(R, th, tl, C):
    T = th.astype(jnp.float64) + tl.astype(jnp.float64)
    den = jax.lax.dot_general(R, T, dim_bk_kn)
    W = C.astype(jnp.float64) / den
    S = jax.lax.dot_general(W, T, dim_bn_kn)
    return den, S

def _split(x):
    h = x.astype(jnp.float32)
    l = (x - h.astype(jnp.float64)).astype(jnp.float32)
    return h, l

@jax.jit
def pair_split(R, th, tl, C):
    Rh, Rl = _split(R)
    f64dot = lambda a, b, dims: jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float64)
    den = f64dot(Rh, th, dim_bk_kn) + f64dot(Rh, tl, dim_bk_kn) \
        + f64dot(Rl, th, dim_bk_kn)
    W = C.astype(jnp.float64) / den
    Wh, Wl = _split(W)
    S = f64dot(Wh, th, dim_bn_kn) + f64dot(Wh, tl, dim_bn_kn) \
        + f64dot(Wl, th, dim_bn_kn)
    return den, S

@jax.jit
def pair_f32(R, th, C):
    R32 = R.astype(jnp.float32)
    den = jax.lax.dot_general(R32, th, dim_bk_kn,
                              precision=jax.lax.Precision.HIGHEST)
    W = C / den
    S = jax.lax.dot_general(W, th, dim_bn_kn,
                            precision=jax.lax.Precision.HIGHEST)
    return den, S

def timeit(fn, *a, reps=3, inner=8):
    out = fn(*a); jax.block_until_ready(out)  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn(*a)
        _ = float(out[1][0, 0])
        best = min(best, (time.time() - t0) / inner)
    return best, out

t64, o64 = timeit(pair_f64, R, th, tl, C)
tsp, osp = timeit(pair_split, R, th, tl, C)
t32, o32 = timeit(pair_f32, R, th, C)
print(f"f64 pair/chunk:   {t64*1e3:8.2f} ms -> sweep {t64*NCHUNKS:6.3f} s", flush=True)
print(f"split pair/chunk: {tsp*1e3:8.2f} ms -> sweep {tsp*NCHUNKS:6.3f} s", flush=True)
print(f"f32 pair/chunk:   {t32*1e3:8.2f} ms -> sweep {t32*NCHUNKS:6.3f} s", flush=True)
S64 = np.asarray(o64[1]); Ssp = np.asarray(osp[1]); S32 = np.asarray(o32[1])
print(f"split vs f64 rel err: {np.max(np.abs(Ssp-S64)/np.abs(S64)):.2e}", flush=True)
print(f"f32   vs f64 rel err: {np.max(np.abs(S32-S64)/np.abs(S64)):.2e}", flush=True)
