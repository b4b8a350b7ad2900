"""Probe: is the f64 chunk matmul pair overhead-bound? Scale nc and B."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import pymbar_tpu
import jax, jax.numpy as jnp

K = 1024
dim_bk_kn = (((1,), (0,)), ((), ()))
dim_bn_kn = (((1,), (1,)), ((), ()))

def make(B, NC):
    rng = np.random.default_rng(0)
    R = jnp.asarray(np.exp(rng.uniform(-0.1, 0.1, (B, K))))
    th = jnp.asarray(rng.uniform(0.1, 1.0, (K, NC)), jnp.float32)
    tl = jnp.asarray(rng.uniform(-1, 1, (K, NC)) * 3e-8, jnp.float32)
    C = jnp.asarray(rng.poisson(1.0, (B, NC)), jnp.float32)
    return R, th, tl, C

@jax.jit
def pair_f64(R, th, tl, C):
    T = th.astype(jnp.float64) + tl.astype(jnp.float64)
    den = jax.lax.dot_general(R, T, dim_bk_kn)
    W = C.astype(jnp.float64) / den
    S = jax.lax.dot_general(W, T, dim_bn_kn)
    return den, S

@jax.jit
def den_only(R, th, tl):
    T = th.astype(jnp.float64) + tl.astype(jnp.float64)
    return jax.lax.dot_general(R, T, dim_bk_kn)

def timeit(fn, *a, reps=3, inner=6):
    out = fn(*a); jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn(*a)
        o = out[1] if isinstance(out, tuple) else out
        _ = float(o[0, 0])
        best = min(best, (time.time() - t0) / inner)
    return best

N_TOT = 16384 * 61
for B, NC in [(64, 16384), (64, 32768), (64, 65536), (128, 16384), (64, 8192)]:
    a = make(B, NC)
    t = timeit(pair_f64, *a)
    sweep = t * (N_TOT / NC)
    print(f"B={B:4d} nc={NC:6d}: {t*1e3:8.2f} ms/chunk -> sweep {sweep:6.3f} s", flush=True)
a = make(64, 16384)
td = timeit(den_only, *a[:3])
print(f"den-only B=64 nc=16384: {td*1e3:8.2f} ms (pair was both matmuls + T)", flush=True)
