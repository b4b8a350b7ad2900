"""Probe: measure the batched-bootstrap FAST phase's true error floor at
the bench's 8 GB config (round-5 follow-up — BENCH_r05 shows the fast
phase hits its 10-iteration cap and the exact phase's first sweep delta
is ~1.2e-3, far above the documented ~3e-7 f32 floor; this measures the
f32 S-pass relative error and the fast iteration's plateau directly).

All jits take the planes as ARGUMENTS (closure capture of device arrays
makes XLA treat 8 GB as lowered constants — pathological compile time).
Logs to /tmp/probe_fast_floor.log (background pipes lose buffered output
on timeout).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import bench

_LOG = open("/tmp/probe_fast_floor.log", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    _LOG.write(msg + "\n")


jax, jnp, gen_dd, gen_f64, N_k64, f_analytic = bench._setup()
from functools import partial
from pymbar_tpu.solvers_large import (
    solve_mbar_dd,
    _materialize_th,
    _batched_wsum_S,
    _batch_chunk_width,
    _batch_step,
    dd_from_f64,
)

key = jax.random.PRNGKey(20260816)
t0 = time.time()
u_hi, u_lo = gen_dd(key)
jax.block_until_ready(u_hi)
log(f"planes: {time.time()-t0:.1f}s")

Nk_host = np.full(bench.K, float(bench.N_PER_STATE))
t0 = time.time()
f, info = solve_mbar_dd(u_hi, u_lo, Nk_host, tol=bench.TOL)
log(f"solve: {time.time()-t0:.1f}s")

B = 16  # smaller group for the probe; the physics is per-replicate
rngb = np.random.RandomState(7)
counts = np.zeros((B, bench.N), np.uint8)
for b in range(B):
    r = rngb.randint(0, bench.N_PER_STATE, size=bench.N) + np.repeat(
        np.arange(bench.K) * bench.N_PER_STATE, bench.N_PER_STATE
    )
    counts[b] = np.bincount(r, minlength=bench.N)
C_dev = jnp.asarray(counts)
jax.block_until_ready(C_dev)
log("counts ready")

K, N = u_hi.shape
n_chunk = _batch_chunk_width(K, N)
f0 = jnp.asarray(np.asarray(f) - np.asarray(f)[0])
N_k64j = jnp.asarray(Nk_host)
hinv = jnp.asarray(info["hinv"])
g0h, g0l = dd_from_f64(f0 + jnp.log(N_k64j))
th = _materialize_th(u_hi, u_lo, g0h, g0l, n_chunk)
jax.block_until_ready(th)
log("th ready")


@partial(jax.jit, static_argnames=("exact", "use_th"))
def S_pass(u_hi, u_lo, th, C, R, exact, use_th):
    return _batched_wsum_S(
        u_hi, u_lo, g0h, g0l, R, C, n_chunk, exact,
        th=(th if use_th else None),
    )


@partial(jax.jit, static_argnames=("exact", "use_th"))
def step(u_hi, u_lo, th, C, F, exact, use_th):
    def S_fn(g0h_, g0l_, R, exact_):
        return _batched_wsum_S(
            u_hi, u_lo, g0h_, g0l_, R, C, n_chunk, exact_,
            th=(th if use_th else None),
        )

    return _batch_step(S_fn, g0h, g0l, f0, N_k64j, hinv,
                       jnp.float64(1.0), F, exact=exact)


# 1) S relative error of the fast (f32/th) pass vs the exact pass at the
#    base point (R = ones).
R = jnp.ones((B, K), jnp.float64)
t0 = time.time()
Sx = np.asarray(S_pass(u_hi, u_lo, th, C_dev, R, True, False))
log(f"exact S pass (compile+run): {time.time()-t0:.1f}s")
t0 = time.time()
Sx2 = np.asarray(S_pass(u_hi, u_lo, th, C_dev, R, True, False))
log(f"exact S pass (warm): {time.time()-t0:.3f}s")
t0 = time.time()
Sf = np.asarray(S_pass(u_hi, u_lo, th, C_dev, R, False, True))
log(f"fast S pass (compile+run): {time.time()-t0:.1f}s")
t0 = time.time()
Sf = np.asarray(S_pass(u_hi, u_lo, th, C_dev, R, False, True))
log(f"fast S pass (warm): {time.time()-t0:.3f}s")
rel = np.abs(Sf - Sx) / np.maximum(np.abs(Sx), 1e-300)
log(f"S rel err (th fast vs exact): max={rel.max():.2e} "
    f"median={np.median(rel):.2e}")

# 2) exact-sweep trajectory from the base point = truth; timed per sweep.
Ft = jnp.broadcast_to(f0[None, :], (B, K)).astype(jnp.float64)
for i in range(8):
    t0 = time.time()
    Ft, dt = step(u_hi, u_lo, th, C_dev, Ft, True, False)
    jax.block_until_ready(Ft)
    log(f"exact sweep {i}: d_max={float(jnp.max(dt)):.2e} "
        f"({time.time()-t0:.3f}s)")

# 3) fast-iteration trajectory: step delta d and true distance to truth.
F = jnp.broadcast_to(f0[None, :], (B, K)).astype(jnp.float64)
for it in range(16):
    t0 = time.time()
    F, d = step(u_hi, u_lo, th, C_dev, F, False, True)
    jax.block_until_ready(F)
    err = float(jnp.max(jnp.abs(F - Ft)))
    log(f"fast it {it}: d_max={float(jnp.max(d)):.2e} "
        f"d_med={float(jnp.median(d)):.2e} true_err={err:.2e} "
        f"({time.time()-t0:.3f}s)")


# 4) matmul-only "exact" variant: f64 matmuls on the resident th cast per
#    chunk (isolates the f64-emulated matmul cost from the dd exp cost).
@jax.jit
def S_mm_only(th, C, R):
    S = jnp.zeros((B, K), jnp.float64)
    dim_bk_kn = (((1,), (0,)), ((), ()))
    dim_bn_kn = (((1,), (1,)), ((), ()))
    n_main = N // n_chunk

    def body(i, acc):
        s0 = i * n_chunk
        T = jax.lax.dynamic_slice(th, (0, s0), (K, n_chunk)).astype(
            jnp.float64
        )
        C_c = jax.lax.dynamic_slice(C, (0, s0), (B, n_chunk)).astype(
            jnp.float64
        )
        den = jax.lax.dot_general(R, T, dim_bk_kn)
        W = C_c / den
        return acc + jax.lax.dot_general(W, T, dim_bn_kn)

    S = jax.lax.fori_loop(0, n_main, body, S)
    rem = N - n_main * n_chunk
    if rem:
        T = th[:, n_main * n_chunk:].astype(jnp.float64)
        C_c = C[:, n_main * n_chunk:].astype(jnp.float64)
        den = jax.lax.dot_general(R, T, dim_bk_kn)
        W = C_c / den
        S = S + jax.lax.dot_general(W, T, dim_bn_kn)
    return R * S


for rep in range(3):
    t0 = time.time()
    jax.block_until_ready(S_mm_only(th, C_dev, R))
    log(f"S f64-matmul-only pass: {time.time()-t0:.3f}s")


# 5) segmented-accumulation fast variant: same th plane, f32 matmuls, but
#    the nc contraction runs in segments with f64 inter-segment adds.
@partial(jax.jit, static_argnames=("seg",))
def S_seg_pass(th, C, R, seg):
    S = jnp.zeros((B, K), jnp.float64)
    dim_bk_kn = (((1,), (0,)), ((), ()))
    R32 = R.astype(jnp.float32)
    n_main = N // n_chunk

    def chunk(th_c, C_c, acc):
        den = jax.lax.dot_general(
            R32, th_c, dim_bk_kn, precision=jax.lax.Precision.HIGHEST
        )
        W = C_c / den  # (B, nc) f32
        nseg = th_c.shape[1] // seg
        Wr = W.reshape(B, nseg, seg)
        Tr = th_c.reshape(K, nseg, seg)
        S_seg = jax.lax.dot_general(
            Wr, Tr, (((2,), (2,)), ((1,), (1,))),
            precision=jax.lax.Precision.HIGHEST,
        )  # (nseg, B, K)
        return acc + jnp.sum(S_seg.astype(jnp.float64), axis=0)

    def body(i, acc):
        s0 = i * n_chunk
        th_c = jax.lax.dynamic_slice(th, (0, s0), (K, n_chunk))
        C_c = jax.lax.dynamic_slice(C, (0, s0), (B, n_chunk)).astype(
            jnp.float32
        )
        return chunk(th_c, C_c, acc)

    S = jax.lax.fori_loop(0, n_main, body, S)
    rem = N - n_main * n_chunk
    if rem:
        # pad the remainder to a whole number of segments with zeros
        pad = (-rem) % seg
        th_r = jnp.pad(th[:, n_main * n_chunk:], ((0, 0), (0, pad)))
        C_r = jnp.pad(
            C[:, n_main * n_chunk:].astype(jnp.float32),
            ((0, 0), (0, pad)),
        )
        S = chunk(th_r, C_r, S)
    return R * S


for seg in (512, 2048):
    t0 = time.time()
    Ss = np.asarray(S_seg_pass(th, C_dev, R, seg))
    log(f"seg{seg} S pass (compile+run): {time.time()-t0:.1f}s")
    t0 = time.time()
    Ss = np.asarray(S_seg_pass(th, C_dev, R, seg))
    log(f"seg{seg} S pass (warm): {time.time()-t0:.3f}s")
    rel = np.abs(Ss - Sx) / np.maximum(np.abs(Sx), 1e-300)
    log(f"seg{seg} S rel err vs exact: max={rel.max():.2e} "
        f"median={np.median(rel):.2e}")
