#!/usr/bin/env python
"""Benchmark: MBAR solve at K=1024, N~1e6 on TPU vs the reference on CPU.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup, ...}

* Problem: BASELINE.json config — evenly spaced harmonic oscillators,
  K=1024 states x ~1e6 total samples, solved to 1e-12 relative tolerance.
* Solver: the TPU-scale two-phase path (pymbar_tpu.solvers_large) — an f32
  adaptive phase on the hi plane followed by a double-word Newton polish
  whose logsumexp reductions run through the fused Pallas kernels.  The
  reduced potentials are generated, preconditioned and double-word-split
  chunkwise ON DEVICE (no host transfer, no full f64 copy ever lives in
  HBM next to the planes).
* Cross-check: the converged f_k is validated against an XLA-f64 adaptive
  solve of the same problem (delta_f_max_err_vs_f64) and against the
  analytic free energies (statistical-noise level).
* vs_baseline: reference pymbar's JAX-CPU backend on the same problem at
  N/10, scaled linearly (cached in bench_baseline.json).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np

K = 1024
N_PER_STATE = 976  # ~1e6 total samples
N = K * N_PER_STATE
TOL = 1.0e-12
CHUNKS = 16
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")


def _fence(*xs):
    """Hard synchronization fence for timing.

    ``jax.block_until_ready`` is UNRELIABLE under the tunneled axon
    platform — measured returning immediately with device work still
    pending (which silently turns a timing loop into a dispatch-latency
    measurement).  A scalar device->host readback of a value that depends
    on the result cannot complete before the computation has, so every
    timed region in this file ends with one.
    """
    import jax as _jax

    out = 0.0
    for x in xs:
        for leaf in _jax.tree_util.tree_leaves(x):
            if isinstance(leaf, np.ndarray) or np.isscalar(leaf):
                out += float(np.asarray(leaf).ravel()[0])
            else:
                # device array: scalar-index ON DEVICE (no bulk transfer),
                # then a blocking scalar device->host read.
                out += float(leaf.reshape(-1)[0])
    return out


def _median3(fn, reps=3):
    """Median-of-``reps`` wall of ``fn()`` (which must block until its
    result is complete — return host arrays or end with :func:`_fence`).

    Every ``*_s`` bench field uses this: single-shot walls under the
    tunneled frontend swing ±35-60% run-to-run (BENCH_r03 vs r04), which
    made round-over-round comparison unjudgeable; the median absorbs
    jitter in BOTH directions, unlike best-of-N's low bias.  Returns
    (median_wall, last_result).
    """
    walls = []
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return float(np.median(walls)), out


def _setup():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pymbar_tpu.ops.mbar_core import _logden_direct

    O = jnp.linspace(0.0, 5.0, K, dtype=jnp.float64)
    Kf = jnp.linspace(1.0, 3.0, K, dtype=jnp.float64)
    f_analytic = np.asarray(-0.5 * jnp.log(2 * jnp.pi / Kf))
    f_analytic = f_analytic - f_analytic[0]

    N_k64 = jnp.full(K, float(N_PER_STATE), dtype=jnp.float64)
    f0 = jnp.zeros(K, dtype=jnp.float64)
    c_shift = 0.0  # dot(N_k, f0)/N = 0 at the zero initial guess

    @jax.jit
    def gen_dd(key):
        """Generate, precondition (f=0) and double-word split, chunkwise.

        Only the two f32 planes (8 GB total) plus one small f64 chunk are
        ever live — the full f64 matrix never exists.
        """
        z = jax.random.normal(key, (K, N_PER_STATE), dtype=jnp.float32).astype(jnp.float64)
        x = (O[:, None] + z / jnp.sqrt(Kf)[:, None]).reshape(-1)

        nc = N // CHUNKS

        def body(c, planes):
            uh, ul = planes
            xc = jax.lax.dynamic_slice(x, (c * nc,), (nc,))
            u64 = 0.5 * Kf[:, None] * (xc[None, :] - O[:, None]) ** 2
            # precondition: per-column min shift + logden shift (f = 0)
            u64 = u64 - jnp.min(u64, axis=0)[None, :]
            ld = _logden_direct(u64, N_k64, f0)
            u64 = u64 + (ld - c_shift)[None, :]
            hi = u64.astype(jnp.float32)
            lo = (u64 - hi.astype(jnp.float64)).astype(jnp.float32)
            uh = jax.lax.dynamic_update_slice(uh, hi, (0, c * nc))
            ul = jax.lax.dynamic_update_slice(ul, lo, (0, c * nc))
            return uh, ul

        planes = (
            jnp.zeros((K, N), jnp.float32),
            jnp.zeros((K, N), jnp.float32),
        )
        return jax.lax.fori_loop(0, CHUNKS, body, planes)

    @jax.jit
    def gen_f64(key):
        """The same preconditioned problem in f64 (for the cross-check solve,
        run after the planes are freed — they cannot coexist in HBM)."""
        z = jax.random.normal(key, (K, N_PER_STATE), dtype=jnp.float32).astype(jnp.float64)
        x = (O[:, None] + z / jnp.sqrt(Kf)[:, None]).reshape(-1)
        nc = N // CHUNKS

        def body(c, u):
            xc = jax.lax.dynamic_slice(x, (c * nc,), (nc,))
            u64 = 0.5 * Kf[:, None] * (xc[None, :] - O[:, None]) ** 2
            u64 = u64 - jnp.min(u64, axis=0)[None, :]
            ld = _logden_direct(u64, N_k64, f0)
            u64 = u64 + (ld - c_shift)[None, :]
            return jax.lax.dynamic_update_slice(u, u64, (0, c * nc))

        return jax.lax.fori_loop(0, CHUNKS, body, jnp.zeros((K, N), jnp.float64))

    return jax, jnp, gen_dd, gen_f64, N_k64, f_analytic


# The wsum kernel's VPU ops/element are DERIVED by tracing the kernel's
# exact math and counting elementwise-arithmetic jaxpr primitives (see
# derive_wsum_flops below) — replacing the previous hardcoded estimate.
# The number is computed at bench time and reported as wsum_flops_per_elem.


_FLOP_PRIMS = {
    # elementwise VPU arithmetic (one issue slot per output element; FMA
    # fusion is NOT assumed — the peak kernel is counted the same way)
    "add", "sub", "mul", "div", "neg", "max", "min", "abs",
    "floor", "round", "sign", "rsqrt", "sqrt", "log", "exp",
    "select_n", "and", "or", "xor", "not", "shift_left",
    "shift_right_logical", "shift_right_arithmetic", "eq", "ne", "lt",
    "le", "gt", "ge", "convert_element_type", "bitcast_convert_type",
    "integer_pow", "is_finite",
}


def _count_jaxpr_ops(jaxpr):
    """Total elementwise-op count of a jaxpr: sum over FLOP-like primitives
    of their output element counts (recursing into sub-jaxprs)."""
    import numpy as _np

    total = 0
    for eqn in jaxpr.eqns:
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                total += _count_jaxpr_ops(sub.jaxpr)
        if eqn.primitive.name in _FLOP_PRIMS:
            for ov in eqn.outvars:
                total += int(_np.prod(ov.aval.shape)) if ov.aval.shape else 1
    return total


def derive_wsum_flops(K=64, T=256, fast=True):
    """VPU ops per (k, n) element of the wsum kernel, derived by tracing.

    Reconstructs the kernel body's exact math (argument assembly, dd exp,
    dd column tree-sum, reciprocal, weight multiply, dd row tree-sum) as a
    pure function and counts elementwise-arithmetic primitives in its
    jaxpr.  K x T is large enough that the per-column/per-row amortized
    terms are at their asymptotic share (<2% finite-size effect).
    """
    import jax
    import jax.numpy as jnp

    from pymbar_tpu.ops import pallas_kernels as pk
    from pymbar_tpu.ops.doubledouble import dd_mul, dd_recip

    def body(uh, ul, gh, gl):
        m = jnp.max(gh - uh, axis=0, keepdims=True)
        e_hi, e_lo = pk._exp_terms(uh, ul, gh, gl, m, fast=fast)
        s_hi, s_lo = pk._dd_tree_sum(e_hi, e_lo, axis=0)
        r_hi, r_lo = dd_recip(s_hi, s_lo)
        w_hi, w_lo = dd_mul(e_hi, e_lo, r_hi, r_lo)
        return pk._dd_tree_sum(w_hi, w_lo, axis=1)

    import numpy as _np

    args = [
        jax.ShapeDtypeStruct((K, T), _np.float32),
        jax.ShapeDtypeStruct((K, T), _np.float32),
        jax.ShapeDtypeStruct((K, 1), _np.float32),
        jax.ShapeDtypeStruct((K, 1), _np.float32),
    ]
    with jax.enable_x64(False):
        jaxpr = jax.make_jaxpr(body)(*args)
    return _count_jaxpr_ops(jaxpr.jaxpr) / (K * T)


def measure_vpu_peak(outer=32768, inner=64, shape=(512, 512), reps=3):
    """Sustained elementwise-op rate of a synthetic VMEM-resident kernel.

    A Pallas kernel chains ``x = x * x + c`` (data-dependent, unfoldable;
    2 ops/element/step, counted the same way derive_wsum_flops counts) on
    a VMEM block with no HBM traffic inside the loop — an empirical
    ceiling for what any elementwise kernel can sustain on this chip.
    The chain is an in-kernel fori_loop of ``outer`` steps x ``inner``
    unrolled ops so one dispatch carries ~1e11 ops (a tunneled frontend
    adds ~30 ms dispatch latency; anything smaller measures the tunnel,
    not the VPU).  Returns ops/second (best of ``reps``).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        c = jnp.float32(1.0e-9)

        def body(_i, x):
            for _ in range(inner):
                x = x * x + c
            return x

        o_ref[:, :] = jax.lax.fori_loop(0, outer, body, x_ref[:, :])

    @jax.jit
    def run(x):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(shape, lambda: (0, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(shape, lambda: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            )(x)

    import numpy as _np

    x = jnp.asarray(_np.random.default_rng(0).uniform(0.5, 0.9, shape), jnp.float32)
    _fence(run(x))  # warm-up / compile, hard-synced
    best = _np.inf
    for _ in range(reps):
        t0 = time.time()
        out = run(x)
        _fence(out)
        best = min(best, time.time() - t0)
    return 2.0 * shape[0] * shape[1] * outer * inner / best


def measure_wsum_ceiling(K_pad=1024, tile=512, steps=8192, reps=3, fast=True):
    """Attainable compute rate of the PRODUCTION wsum kernel, elements/s.

    Runs the exact ``_wsum_kernel`` pallas body with the same block shapes
    and grid machinery as the streaming kernel, but with every grid step's
    index map pinned to block (0, 0) of a single-tile input: HBM reads hit
    the same 4 MB over and over (DRAM row-buffer friendly, trivially
    prefetchable), so the measured rate is what the kernel's COMPUTE can
    sustain when memory is effectively free.  The streaming kernel's rate
    divided by this is a true 0-100%% roofline fraction with the identical
    compilation — no op counting involved (a jaxpr-derived semantic-op
    count includes arithmetic Mosaic pairs into FMAs or folds away, which
    is why the older semantic-ops-vs-VPU-peak ratio could exceed 100%%).
    An alternative fori_loop-inside-one-grid-step formulation was tried
    and rejected: Mosaic compiles the loop-carried body ~3.6x slower than
    the production grid body, understating the ceiling.  ``steps`` puts
    ~4e9 elements behind one dispatch (the tunneled frontend adds ~30 ms
    latency).  Returns elements/second (best of ``reps``).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pymbar_tpu.ops import pallas_kernels as pk

    kernel = functools.partial(pk._wsum_kernel, fast=fast, weighted=False)
    block_u = pl.BlockSpec((K_pad, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    block_g = pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(uh, ul, gh, gl):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(steps,),
                in_specs=[block_u, block_u, block_g, block_g],
                out_specs=[block_g, block_g],
                out_shape=[
                    jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
                    jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
                ],
            )(uh, ul, gh, gl)

    import numpy as _np

    rng = _np.random.default_rng(0)
    uh = jnp.asarray(rng.uniform(0.0, 50.0, (K_pad, tile)), jnp.float32)
    ul = jnp.asarray(rng.uniform(-1e-7, 1e-7, (K_pad, tile)), jnp.float32)
    gh = jnp.asarray(rng.uniform(-2.0, 2.0, (K_pad, 1)), jnp.float32)
    gl = jnp.zeros((K_pad, 1), jnp.float32)
    _fence(run(uh, ul, gh, gl))  # warm-up / compile, hard-synced
    best = _np.inf
    for _ in range(reps):
        t0 = time.time()
        out = run(uh, ul, gh, gl)
        _fence(out)
        best = min(best, time.time() - t0)
    return K_pad * tile * steps / best


def measure_wsum_big_ceiling(K_pad=4096, tile=128, steps=16384, reps=3, fast=True):
    """Attainable compute rate of the K>2048 single-read route, elements/s.

    The same pinned-block construction as :func:`measure_wsum_ceiling`,
    applied to the PRODUCTION ``_wsum_big_kernel`` body (in-kernel k-block
    loops, T1 parked in VMEM scratch) at its production shapes (K_pad=4096,
    tile 128, k_blk 512): every grid step's index map points at block
    (0, 0) of a single 2 MB tile, so HBM is effectively free and the
    measured rate is the kernel's compute ceiling.  The streaming K=4096
    rate divided by this is the route's own roofline fraction — extending
    the round-3 measured-ceiling argument beyond the one-tile kernel.
    ``steps`` puts ~8.6e9 elements behind one dispatch: the tunneled
    frontend's ~30-45 ms per-dispatch latency would otherwise understate
    the ceiling (a 2048-step variant measured a "ceiling" BELOW the
    streaming rate).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pymbar_tpu.ops import pallas_kernels as pk

    kernel = functools.partial(
        pk._wsum_big_kernel,
        fast=fast,
        k_blk=min(pk._WSUM_BIG_KBLK, K_pad),
        weighted=False,
    )
    block_u = pl.BlockSpec((K_pad, tile), lambda i: (0, 0), memory_space=pltpu.VMEM)
    block_g = pl.BlockSpec((K_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(uh, ul, gh, gl):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(steps,),
                in_specs=[block_u, block_u, block_g, block_g],
                out_specs=[block_g, block_g],
                out_shape=[
                    jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
                    jax.ShapeDtypeStruct((K_pad, 1), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((K_pad, tile), jnp.float32),
                    pltpu.VMEM((K_pad, tile), jnp.float32),
                ],
            )(uh, ul, gh, gl)

    import numpy as _np

    rng = _np.random.default_rng(0)
    uh = jnp.asarray(rng.uniform(0.0, 50.0, (K_pad, tile)), jnp.float32)
    ul = jnp.asarray(rng.uniform(-1e-7, 1e-7, (K_pad, tile)), jnp.float32)
    gh = jnp.asarray(rng.uniform(-2.0, 2.0, (K_pad, 1)), jnp.float32)
    gl = jnp.zeros((K_pad, 1), jnp.float32)
    _fence(run(uh, ul, gh, gl))  # warm-up / compile, hard-synced
    best = _np.inf
    for _ in range(reps):
        t0 = time.time()
        out = run(uh, ul, gh, gl)
        _fence(out)
        best = min(best, time.time() - t0)
    return K_pad * tile * steps / best


def tpu_solve():
    jax, jnp, gen_dd, gen_f64, N_k64, f_analytic = _setup()

    from pymbar_tpu.ops.doubledouble import dd_from_f64
    from pymbar_tpu.ops.mbar_core import log_denominator_n
    from pymbar_tpu.ops.pallas_kernels import wsum_dd
    from pymbar_tpu.solvers_large import solve_mbar_dd

    key = jax.random.PRNGKey(20260816)
    u_hi, u_lo = gen_dd(key)
    jax.block_until_ready(u_hi)

    def solve():
        f, info = solve_mbar_dd(u_hi, u_lo, np.full(K, float(N_PER_STATE)), tol=TOL)
        return f, info

    f, info = solve()  # warm-up / compile
    solve_s, (f, info) = _median3(solve)

    f = f - f[0]
    delta_f_rmse = float(np.sqrt(np.mean((f - f_analytic) ** 2)))

    # Throughput of the hot reduction — the fused wsum kernel (one dd
    # logsumexp-weights pass over both planes; planes still resident).
    # Best of 5 singles (the sustained rate, free of scheduler jitter).
    gh, gl = dd_from_f64(jnp.asarray(f) + jnp.log(N_k64))
    _fence(wsum_dd(u_hi, u_lo, gh, gl))  # warm-up / compile, hard-synced
    # 3 back-to-back passes per timed region, one fence: dispatches execute
    # in order, so fencing the last output drains all three — the tunnel's
    # ~30-45 ms readback round trip amortizes to a third of a pass.
    dd_pass = np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(3):
            out = wsum_dd(u_hi, u_lo, gh, gl)
        _fence(out)
        dd_pass = min(dd_pass, (time.time() - t0) / 3)

    # Roofline, measured directly: the SAME tile math applied to a
    # VMEM-resident block with no HBM streaming (measure_wsum_ceiling) is
    # the kernel's compute speed-of-light in elements/s; the streaming
    # kernel's element rate against it is the roofline fraction — no op
    # counting involved.  (The older semantic-ops-vs-VPU-peak ratio is
    # kept as corroboration, but it can exceed 100% because the
    # jaxpr-derived op count includes arithmetic Mosaic pairs into FMAs
    # or folds away — docs/numerics.md.)  HBM traffic at the measured
    # rate (8 B/element over ~100 GB/s vs ~800 GB/s chip bandwidth)
    # confirms the kernel is compute-bound, not bandwidth-bound.
    wsum_flops = derive_wsum_flops()
    vpu_peak_ops = measure_vpu_peak()
    wsum_ceiling = measure_wsum_ceiling()  # elements/s, VMEM-resident
    wsum_elem_rate = K * N / dd_pass
    roofline_pct = 100.0 * wsum_elem_rate / wsum_ceiling
    wsum_ops_rate = K * N * wsum_flops / dd_pass
    semantic_ops_ratio = wsum_ops_rate / vpu_peak_ops
    semantic_floor_pct = 100.0 * semantic_ops_ratio / 2.0

    # Bootstrap replicate throughput at the 8 GB config through the batched
    # engine (all replicates per iteration from ONE shared dd-exp stream of
    # the resident planes + MXU matmuls; f32 fast phase, f64 certification)
    # — the production bootstrap path.
    from pymbar_tpu.solvers_large import bootstrap_polish_dd

    rngb = np.random.RandomState(7)
    B = 64
    # uint16, matching MBAR.__init__'s builder: integer-typed counts skip
    # the engine's full-matrix integrality scan on the one host vCPU
    counts = np.zeros((B, N), np.uint16)
    for b in range(B):
        r = rngb.randint(0, N_PER_STATE, size=N) + np.repeat(
            np.arange(K) * N_PER_STATE, N_PER_STATE
        )
        counts[b] = np.bincount(r, minlength=N)
    Nk_host = np.full(K, float(N_PER_STATE))
    f_bb, _nf, _bi0 = bootstrap_polish_dd(  # warm-up / compile (same group shape)
        u_hi, u_lo, Nk_host, f, info["hinv"], counts
    )
    boot_s, (f_boots, n_fail, boot_info) = _median3(
        lambda: bootstrap_polish_dd(
            u_hi, u_lo, Nk_host, f, info["hinv"], counts
        )
    )
    boot_reps_per_s = B / boot_s
    boot_sigma_finite = bool(np.all(np.isfinite(np.std(f_boots, axis=0))))

    # Reference-equivalent tolerance: the reference solves every bootstrap
    # replicate with its default relative_tolerance=1e-7
    # (/root/reference/pymbar/mbar.py:90); the headline number above
    # certifies 1e-12 (5 orders tighter).  tol is a traced scalar in the
    # exact-phase jit, so this re-times the SAME compiled engine — the
    # apples-to-apples replicate throughput at reference semantics.
    reftol_s, (f_boots_rt, n_fail_rt, _bi_rt) = _median3(
        lambda: bootstrap_polish_dd(
            u_hi, u_lo, Nk_host, f, info["hinv"], counts, tol=1.0e-7
        )
    )
    boot_reftol_reps_per_s = B / reftol_s
    # at 1e-7 every replicate must certify d < tol outright
    boot_reftol_n_fail = int(n_fail_rt)
    # the loose-tol replicates must agree with the tight ones far below
    # the statistical noise (sigma >= ~1e-5)
    boot_reftol_max_dev = float(
        np.max(np.abs(np.asarray(f_boots_rt) - np.asarray(f_boots)))
    )
    del f_boots_rt

    # Mesh twin at the same HBM edge (VERDICT r4 item 10): force the
    # sharded batched-bootstrap path on a 1-device mesh over the REAL
    # chip — n-sharded plane layout, per-shard resident th plane, count
    # shard uploads and the group chunking all run at the 8 GB config.
    # On one device the shardings are equivalent, so device_put aliases
    # the resident planes (no copy); if a backend ever copies, drop the
    # originals immediately to stay inside HBM.
    from jax.sharding import Mesh as _Mesh
    from jax.sharding import NamedSharding as _NS
    from jax.sharding import PartitionSpec as _P

    from pymbar_tpu.parallel.sharding import sharded_bootstrap_polish_dd

    mesh1 = _Mesh(np.asarray(jax.devices()[:1]), ("n",))
    pl_sh = _NS(mesh1, _P(None, "n"))
    # On one device the target sharding is equivalent, so device_put
    # returns a view over the SAME buffers (measured on this backend: a
    # distinct Array object, shared storage — deleting the original
    # kills both).  No copy happens, so nothing is freed here.
    u_hi_s = jax.device_put(u_hi, pl_sh)
    u_lo_s = jax.device_put(u_lo, pl_sh)

    def _mesh_boot():
        return sharded_bootstrap_polish_dd(
            u_hi_s, u_lo_s, Nk_host, f, info["hinv"], counts, mesh1
        )

    _mesh_boot()  # warm-up / compile
    mesh_boot_s, (f_mboots, n_mfail, _mbi) = _median3(_mesh_boot)
    mesh_reps_per_s = B / mesh_boot_s
    # the mesh stream must reproduce the single-device replicates
    mesh_max_dev = float(np.max(np.abs(f_mboots - np.asarray(f_boots))))

    # Free the planes, regenerate the same problem in f64 (deterministic
    # PRNG), and cross-check with the XLA-f64 adaptive solver.
    del u_hi, u_lo, u_hi_s, u_lo_s, out, gh, gl, f_boots, f_mboots, f_bb
    u64 = gen_f64(key)
    jax.block_until_ready(u64)

    from pymbar_tpu.solvers import _adaptive_while

    f64_ref, *_ = _adaptive_while(
        u64,
        N_k64,
        jnp.zeros(K, jnp.float64),
        jnp.asarray(1.0, jnp.float64),
        jnp.asarray(TOL, jnp.float64),
        2000,
        2,
        "chol",
    )
    f64_ref = np.asarray(f64_ref)
    f64_ref = f64_ref - f64_ref[0]
    dd_vs_f64 = float(np.max(np.abs(f - f64_ref)))

    jitted = jax.jit(log_denominator_n)
    fj = jnp.asarray(f)
    _fence(jitted(u64, N_k64, fj))  # warm-up / compile, hard-synced
    t0 = time.time()
    for _ in range(3):
        out = jitted(u64, N_k64, fj)
    _fence(out)  # in-order execution: one fence drains all three
    f64_pass = (time.time() - t0) / 3

    # The full answer, not just the solve (VERDICT r2 item 7): svd-ew
    # Theta wall time and one expectations-machinery call at the 8 GB
    # config, both on the asserted no-NxK streamed paths.
    from pymbar_tpu.mbar import MBAR as _MBAR

    # The public warm-start constructor: wraps the device-resident matrix
    # and the converged f without re-solving or host round-trips, with the
    # full constructor invariants (pinned equal to a fresh solve by
    # tests/test_mbar.py::test_from_solution_matches_fresh).
    m = _MBAR.from_solution(u64, np.full(K, N_PER_STATE, np.int64), np.asarray(f))

    # svd-ew Theta through the PRODUCTION route (_compute_theta_streamed):
    # one streamed Gram pass + the device lowrank Eq. D4/D5 algebra.  (An
    # earlier bench revision timed the host-dense _theta_svd_ew_from_gram
    # here — ~2.5 s of single-vCPU pinv the class path never runs on TPU.)
    theta = m._compute_theta_streamed()  # warm-up / compile
    _fence(theta)

    def _cov():
        # The lowrank path returns a device-resident Theta whose trailing
        # assembly matmuls are still in flight — fence inside the timed
        # region.
        th = m._compute_theta_streamed()
        _fence(th)
        return th

    cov_s, theta = _median3(_cov)
    assert np.all(np.isfinite(theta))

    # compute_perturbed_free_energies (the augmented-state expectations
    # machinery, streamed: pass A log-normalizers + pass B augmented Gram)
    # through the real class method on a device-resident matrix.
    u_ln = np.asarray(u64[:2]) + np.array([[0.0], [0.1]])
    pert = m.compute_perturbed_free_energies(u_ln)  # warm-up / compile
    expectations_s, pert = _median3(
        lambda: m.compute_perturbed_free_energies(u_ln)
    )
    assert np.all(np.isfinite(pert["Delta_f"]))

    # compute_expectations(A_n) at all K states — u_ln aliases the resident
    # matrix, so both augmented passes run as single-dispatch device scans.
    A_obs = np.asarray(u64[0])
    ex = m.compute_expectations(A_obs)  # warm-up / compile
    expectations_all_states_s, ex = _median3(
        lambda: m.compute_expectations(A_obs)
    )
    assert np.all(np.isfinite(ex["mu"])) and np.all(np.isfinite(ex["sigma"]))

    # compute_entropy_and_enthalpy at the 8 GB config: the observable IS
    # the resident matrix (aliased-observable path — the shift and every
    # observable chunk build on device; no host copy of u_kn exists).
    ee = m.compute_entropy_and_enthalpy()  # warm-up / compile
    entropy_s, ee = _median3(m.compute_entropy_and_enthalpy)
    assert all(np.all(np.isfinite(ee[k])) for k in ee)

    # overlap matrix (streamed Gram + host eig) and Kish effective sample
    # numbers (streamed Gram diagonal) at the same scale.
    ov = m.compute_overlap()  # warm-up / compile
    overlap_s, ov = _median3(m.compute_overlap)
    assert np.isfinite(np.real(ov["scalar"]))
    ne = m.compute_effective_sample_number()  # warm-up / compile
    neff_s, ne = _median3(m.compute_effective_sample_number)
    assert np.all(np.isfinite(ne))

    del u64, out, m

    sigma_rel = sigma_parity_check(jax, jnp)
    k4096 = k4096_slice(jax, jnp)
    fes_d = fes_slice(jax, jnp)

    return dict(
        solve_s=solve_s,
        sigma_rel_err_streamed_vs_f64=sigma_rel,
        f32_iterations="%d coarse + %d full"
        % (info.get("f32_coarse_iterations", 0), info["f32_iterations"]),
        polish_iterations=info["polish_iterations"],
        phase1_s=round(info.get("phase1_s", 0), 3),
        phase2_s=round(info.get("phase2_s", 0), 3),
        polish_deltas=["%.1e" % d for d in info.get("deltas", [])],
        converged=bool(info["converged"]),
        gnorm=info["gnorm"],
        gnorm_per_sample=info["gnorm"] / N_PER_STATE,
        delta_f_rmse_vs_analytic=delta_f_rmse,
        delta_f_max_err_vs_f64=dd_vs_f64,
        logsumexp_dd_gb_s=K * N * 8 / dd_pass / 1e9,
        logsumexp_dd_tflops=K * N * wsum_flops / dd_pass / 1e12,
        logsumexp_f64_gb_s=K * N * 8 / f64_pass / 1e9,
        wsum_flops_per_elem=round(wsum_flops, 1),
        vpu_peak_tops=round(vpu_peak_ops / 1e12, 3),
        wsum_ceiling_gelem_s=round(wsum_ceiling / 1e9, 2),
        wsum_streamed_gelem_s=round(wsum_elem_rate / 1e9, 2),
        vpu_roofline_pct=round(roofline_pct, 1),
        # Ratio of counted (semantic) ops to the single-issue VPU ceiling;
        # >1 is expected (Mosaic FMA pairing) — see docs/numerics.md.
        semantic_ops_vs_single_issue_ratio=round(semantic_ops_ratio, 2),
        vpu_semantic_floor_pct=round(semantic_floor_pct, 1),
        bootstrap_reps_per_s=round(boot_reps_per_s, 3),
        bootstrap_n_fail=int(n_fail),
        bootstrap_n_at_floor=int(boot_info["n_at_floor"]),
        # Real per-phase walls from the production engine (the fast/exact
        # phases run as separate jits with a fence at the boundary).
        bootstrap_phase_walls=boot_info.get("phase_walls"),
        bootstrap_fast_iters=int(boot_info.get("fast_iters", -1)),
        bootstrap_exact_iters_mean=round(
            float(np.mean(boot_info["exact_iters"])), 2
        ),
        bootstrap_exact_iters_max=int(np.max(boot_info["exact_iters"])),
        # Median step delta per exact sweep across live replicates — the
        # measured sweep-count budget (nan rows past every stop dropped).
        bootstrap_exact_sweep_deltas=[
            f"{np.nanmedian(row):.1e}"
            for row in np.asarray(boot_info["exact_deltas"])
            if np.any(np.isfinite(row))
        ],
        bootstrap_sigma_finite=boot_sigma_finite,
        # Same engine at the reference's own replicate tolerance (1e-7,
        # /root/reference/pymbar/mbar.py:90) — the apples-to-apples
        # throughput; the headline above certifies 1e-12.
        bootstrap_reftol_reps_per_s=round(boot_reftol_reps_per_s, 3),
        bootstrap_reftol_n_fail=boot_reftol_n_fail,
        bootstrap_reftol_max_dev_vs_tight=boot_reftol_max_dev,
        bootstrap_mesh_reps_per_s=round(mesh_reps_per_s, 3),
        bootstrap_mesh_n_fail=int(n_mfail),
        bootstrap_mesh_max_dev=mesh_max_dev,
        cov_s=round(cov_s, 3),
        expectations_s=round(expectations_s, 3),
        expectations_all_states_s=round(expectations_all_states_s, 3),
        entropy_s=round(entropy_s, 3),
        overlap_s=round(overlap_s, 3),
        neff_s=round(neff_s, 3),
        **k4096,
        **fes_d,
    )


def sigma_parity_check(jax, jnp):
    """Max relative sigma deviation of the streamed f32-Gram expectations
    path vs the f64 materializing branch, on TPU.

    A canary for TPU-only matmul-precision regressions: with the default
    single-pass bf16 dots this read ~1.1e-1 (round 3); with
    precision=HIGHEST on the covariance Grams it sits at the ~2e-4 f32
    compute floor.  The CPU test suite cannot see this class of bug.
    Small config (K=32 x N=2e5) with the streamed path forced via
    _AUG_STREAM_BYTES so both branches run in seconds.
    """
    import pymbar_tpu.mbar as mbar_mod
    from pymbar_tpu import MBAR, testsystems

    Ks = 32
    tc = testsystems.HarmonicOscillatorsTestCase(
        O_k=np.linspace(0, 2, Ks), K_k=np.linspace(1, 3, Ks)
    )
    x_n, u_kn, N_k, s_n = tc.sample(N_k=[6000] * Ks, mode="u_kn", seed=17)
    m = MBAR(u_kn, N_k)
    saved = mbar_mod._AUG_STREAM_BYTES
    try:
        mbar_mod._AUG_STREAM_BYTES = 0
        ex = m.compute_expectations(x_n)
        mbar_mod._AUG_STREAM_BYTES = 1 << 62
        ex64 = m.compute_expectations(x_n)
    finally:
        mbar_mod._AUG_STREAM_BYTES = saved
    return float(np.max(np.abs(ex["sigma"] - ex64["sigma"]) / ex64["sigma"]))


def k4096_slice(jax, jnp):
    """BASELINE stress-K slice on one chip: K=4096 states (the single-read
    _wsum_big route: in-kernel k-block loops, T1 in VMEM scratch, tile 128),
    N = 4096 x 80 = 327680 samples -> 10.7 GB of planes, the measured
    single-chip HBM edge for the FULL solve (VERDICT r3 item 8): at
    4096 x 96 (12.9 GB) the coarse warm start's subsample plane plus its
    adaptive-phase logsumexp slabs (~1 GB each) exhaust the 16 GB —
    measured, not estimated; the wsum streaming itself would fit.
    Reports kernel GB/s, the route's OWN measured-compute roofline
    fraction, and a full dd solve with its gradient certificate; the
    ICI-sharded N=1e7 version of this config is the multi-chip dryrun's
    job (BASELINE.md stress config)."""
    import jax.numpy as jnp

    from pymbar_tpu.ops.doubledouble import dd_from_f64
    from pymbar_tpu.ops.mbar_core import _logden_direct
    from pymbar_tpu.ops.pallas_kernels import wsum_dd
    from pymbar_tpu.solvers_large import solve_mbar_dd

    K4, NPK4 = 4096, 80
    N4 = K4 * NPK4
    O = jnp.linspace(0.0, 5.0, K4, dtype=jnp.float64)
    Kf = jnp.linspace(1.0, 3.0, K4, dtype=jnp.float64)
    f_true = np.asarray(-0.5 * jnp.log(2 * jnp.pi / Kf))
    f_true = f_true - f_true[0]
    N_k = jnp.full(K4, float(NPK4), dtype=jnp.float64)
    f0 = jnp.zeros(K4, dtype=jnp.float64)
    chunks = 32

    @jax.jit
    def gen(key):
        z = jax.random.normal(key, (K4, NPK4), dtype=jnp.float32).astype(jnp.float64)
        x = (O[:, None] + z / jnp.sqrt(Kf)[:, None]).reshape(-1)
        nc = N4 // chunks

        def body(c, planes):
            uh, ul = planes
            xc = jax.lax.dynamic_slice(x, (c * nc,), (nc,))
            u64 = 0.5 * Kf[:, None] * (xc[None, :] - O[:, None]) ** 2
            u64 = u64 - jnp.min(u64, axis=0)[None, :]
            ld = _logden_direct(u64, N_k, f0)
            u64 = u64 + ld[None, :]
            hi = u64.astype(jnp.float32)
            lo = (u64 - hi.astype(jnp.float64)).astype(jnp.float32)
            return (
                jax.lax.dynamic_update_slice(uh, hi, (0, c * nc)),
                jax.lax.dynamic_update_slice(ul, lo, (0, c * nc)),
            )

        return jax.lax.fori_loop(
            0, chunks, body,
            (jnp.zeros((K4, N4), jnp.float32), jnp.zeros((K4, N4), jnp.float32)),
        )

    uh, ul = gen(jax.random.PRNGKey(4096))
    jax.block_until_ready(uh)

    Nk_host = np.full(K4, float(NPK4))
    f, info = solve_mbar_dd(uh, ul, Nk_host, tol=TOL)  # compile + run
    solve_s, (f, info) = _median3(
        lambda: solve_mbar_dd(uh, ul, Nk_host, tol=TOL)
    )

    gh, gl = dd_from_f64(jnp.asarray(f) + jnp.log(N_k))
    _fence(wsum_dd(uh, ul, gh, gl))  # warm-up / compile, hard-synced
    t0 = time.time()
    for _ in range(3):
        out = wsum_dd(uh, ul, gh, gl)
    _fence(out)  # in-order execution: one fence drains all three
    dd_pass = (time.time() - t0) / 3
    del uh, ul, out

    # The route's own roofline: the identical _wsum_big_kernel body with
    # pinned-block index maps (HBM effectively free) is its compute
    # ceiling; the streaming rate against it closes the measured-ceiling
    # argument for the K>2048 route (VERDICT r3 item 2b).
    big_ceiling = measure_wsum_big_ceiling()  # elements/s
    k4096_roofline = 100.0 * (K4 * N4 / dd_pass) / big_ceiling

    rmse = float(np.sqrt(np.mean((np.asarray(f) - f_true) ** 2)))
    return dict(
        k4096_solve_s=round(solve_s, 4),
        k4096_gnorm=info["gnorm"],
        k4096_gnorm_per_sample=info["gnorm"] / NPK4,
        k4096_delta_f_rmse_vs_analytic=rmse,
        k4096_wsum_gb_s=round(K4 * N4 * 8 / dd_pass / 1e9, 1),
        k4096_ceiling_gelem_s=round(big_ceiling / 1e9, 2),
        k4096_roofline_pct=round(k4096_roofline, 1),
    )


def fes_slice(jax, jnp):
    """FES on the TPU at the GB-scale umbrella config (VERDICT r3 item 3):
    K=64 harmonic windows on a 1-D quadratic base FES, N = 64 x 16384 ~ 1e6
    samples, 100 bins — the scaled analog of the reference's
    umbrella-sampling example (pymbar 4.x examples/umbrella-sampling-fes).
    Times generate_fes + get_fes for the histogram and KDE estimators and
    one ML spline fit, all through the public FES class (the log_w_n pass
    and the augmented-Theta histogram uncertainty ride the streamed paths —
    no N x K weight matrix is materialized)."""
    import time

    from pymbar_tpu import FES

    BETA, K0, Ku = 1.0, 20.0, 100.0
    KW, NPW = 64, 16384
    N = KW * NPW
    rng = np.random.RandomState(23)
    centers = np.linspace(-3.0, 3.0, KW) * 0.2
    sigma = 1.0 / (K0 + Ku)
    # product of base (K0, at 0) and umbrella (Ku, at center) Gaussians
    mu_i = sigma * (Ku * centers)
    x_n = (
        mu_i[:, None] + np.sqrt(sigma) * rng.standard_normal((KW, NPW))
    ).reshape(-1)
    u_n = BETA * (K0 / 2.0) * x_n**2
    N_k = np.full(KW, NPW, dtype=np.int64)

    # The (KW, N) reduced-potential matrix builds ON DEVICE from the (N,)
    # collective variable — production TPU flow: only the 8 MB x_n crosses
    # the frontend, and FES/MBAR consume the resident matrix end to end
    # (the host-matrix flow costs a 0.5 GB upload per sweep on the
    # ~3-25 MB/s tunnel, which is what BENCH <= r4a measured).
    @jax.jit
    def gen_ukn(x):
        u = BETA * (K0 / 2.0) * x**2
        return u[None, :] + BETA * (Ku / 2.0) * (
            x[None, :] - jnp.asarray(centers)[:, None]
        ) ** 2

    u_kn = gen_ukn(jnp.asarray(x_n))
    float(u_kn[0, 0])  # sync

    fes = FES(u_kn, N_k)  # warm-up: trace + persistent-cache hit
    fes_mbar_s, fes = _median3(lambda: FES(u_kn, N_k))

    nbins = 100
    bin_edges = np.linspace(x_n.min() - 1e-6, x_n.max() + 1e-6, nbins + 1)
    bin_centers = 0.5 * (bin_edges[1:] + bin_edges[:-1])

    def run_hist():
        fes.generate_fes(
            u_n, x_n, fes_type="histogram",
            histogram_parameters={"bin_edges": bin_edges},
        )
        return fes.get_fes(
            bin_centers, reference_point="from-lowest",
            uncertainty_method="analytical",
        )

    r = run_hist()  # warm-up / compile
    fes_histogram_s, r = _median3(run_hist)
    # Unpopulated query bins return NaN by design (a fixed deviation from
    # the reference's KeyError); everything populated must be finite, and
    # df_i is 0 at the from-lowest reference bin.
    pop = np.histogram(x_n, bin_edges)[0] > 0
    assert np.all(np.isfinite(r["f_i"][pop]))
    assert np.all(np.isfinite(r["df_i"][pop]))
    # the estimated surface must recover the quadratic base FES
    ref = BETA * (K0 / 2.0) * bin_centers**2
    inner = (np.abs(bin_centers) < 0.5) & pop
    f_c = r["f_i"] - r["f_i"][inner].min()
    hist_rmse = float(
        np.sqrt(np.mean((f_c[inner] - (ref[inner] - ref[inner].min())) ** 2))
    )

    def run_kde():
        fes.generate_fes(
            u_n, x_n, fes_type="kde",
            kde_parameters={"bandwidth": 0.5 * (bin_edges[1] - bin_edges[0])},
        )
        return fes.get_fes(bin_centers, reference_point="from-lowest")

    r = run_kde()  # warm-up / compile
    fes_kde_s, r = _median3(run_kde)
    assert np.all(np.isfinite(r["f_i"]))

    def _bias(k):
        return lambda x: BETA * (Ku / 2.0) * float(
            np.dot(x - centers[k], x - centers[k])
        )

    spline_params = dict(
        spline_weights="unbiasedstate",
        nspline=6,
        spline_initialize="explicit",
        xinit=bin_centers,
        yinit=ref - ref.min(),
        xrange=[bin_edges[0], bin_edges[-1]],
        fkbias=[_bias(k) for k in range(KW)],
        kdegree=3,
        optimization_algorithm="Newton-CG",
        optimize_options={"disp": False, "tol": 1e-6},
        objective="ml",
        map_data=None,
    )

    def run_spline():
        fes.generate_fes(
            u_n, x_n, fes_type="spline", spline_parameters=spline_params
        )
        return fes.get_fes(bin_centers, reference_point="from-lowest")

    r = run_spline()  # warm-up / compile
    fes_spline_s, r = _median3(run_spline)
    assert np.all(np.isfinite(r["f_i"]))

    return dict(
        fes_mbar_s=round(fes_mbar_s, 3),
        fes_histogram_s=round(fes_histogram_s, 3),
        fes_kde_s=round(fes_kde_s, 3),
        fes_spline_s=round(fes_spline_s, 3),
        fes_hist_rmse_vs_analytic=round(hist_rmse, 5),
    )


def reference_baseline():
    """Reference pymbar (JAX CPU backend) at N/10, scaled x10; cached."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)

    # Off this container the reference mount does not exist: degrade to a
    # bench line without vs_baseline instead of a subprocess crash (not
    # cached, so a later run with the mount present still measures it).
    if not os.path.isdir("/root/reference"):
        return dict(
            error="/root/reference not present", ref_solve_s_scaled=None
        )

    import subprocess
    import tempfile

    stub_dir = tempfile.mkdtemp()
    with open(os.path.join(stub_dir, "numexpr.py"), "w") as fh:
        fh.write(
            "import inspect\n"
            "import numpy as np\n"
            "def evaluate(expr, local_dict=None):\n"
            "    frame = inspect.currentframe().f_back\n"
            "    ld = dict(frame.f_globals)\n"
            "    ld.update(frame.f_locals)\n"
            "    if local_dict: ld.update(local_dict)\n"
            "    env = {'exp': np.exp, 'log': np.log, 'sqrt': np.sqrt, 'abs': np.abs}\n"
            "    return eval(expr, env, ld)\n"
        )

    script = f"""
import os, sys, time, json
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, {stub_dir!r})
sys.path.insert(0, "/root/reference")
import pymbar
from pymbar import mbar_solvers

K = {K}
NPK = {N_PER_STATE} // 10
O = np.linspace(0.0, 5.0, K)
Kf = np.linspace(1.0, 3.0, K)
rng = np.random.RandomState(0)
x = (O[:, None] + rng.randn(K, NPK) / np.sqrt(Kf)[:, None]).reshape(-1)
u = 0.5 * Kf[:, None] * (x[None, :] - O[:, None]) ** 2
N_k = np.full(K, float(NPK))
f0 = np.zeros(K)

t0 = time.time()
f, results = mbar_solvers.solve_mbar(u, N_k, f0, solver_protocol=(dict(method="adaptive", continuation=True, options=dict(maxiter=2000)),))
elapsed = time.time() - t0
g = np.asarray(mbar_solvers.mbar_gradient(u, N_k, np.asarray(f)))
print(json.dumps(dict(ref_solve_s_tenth=elapsed, ref_gnorm=float(np.linalg.norm(g)))))
"""
    try:
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        out = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=3000,
            env=env,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        data = json.loads(line)
        data["ref_solve_s_scaled"] = data["ref_solve_s_tenth"] * 10.0
    except Exception as exc:  # baseline is best-effort
        data = dict(error=str(exc)[:200], ref_solve_s_scaled=None)

    with open(BASELINE_CACHE, "w") as fh:
        json.dump(data, fh)
    return data


def main():
    result = tpu_solve()
    base = reference_baseline()

    vs_baseline = None
    if base.get("ref_solve_s_scaled"):
        vs_baseline = base["ref_solve_s_scaled"] / result["solve_s"]

    print(
        json.dumps(
            dict(
                metric="mbar_solve_K1024_N1e6_wall",
                value=round(result["solve_s"], 4),
                unit="s",
                vs_baseline=round(vs_baseline, 2) if vs_baseline else None,
                converged=result["converged"],
                f32_iterations=result["f32_iterations"],
                polish_iterations=result["polish_iterations"],
                phase1_s=result.get("phase1_s"),
                phase2_s=result.get("phase2_s"),
                polish_deltas=result.get("polish_deltas"),
                gradient_norm=result["gnorm"],
                gradient_norm_per_sample=result["gnorm_per_sample"],
                delta_f_rmse_vs_analytic=result["delta_f_rmse_vs_analytic"],
                delta_f_max_err_vs_f64=result["delta_f_max_err_vs_f64"],
                logsumexp_dd_gb_s=round(result["logsumexp_dd_gb_s"], 1),
                logsumexp_dd_tflops=round(result["logsumexp_dd_tflops"], 2),
                logsumexp_f64_gb_s=round(result["logsumexp_f64_gb_s"], 1),
                wsum_flops_per_elem=result["wsum_flops_per_elem"],
                vpu_peak_tops=result["vpu_peak_tops"],
                wsum_ceiling_gelem_s=result["wsum_ceiling_gelem_s"],
                wsum_streamed_gelem_s=result["wsum_streamed_gelem_s"],
                vpu_roofline_pct=result["vpu_roofline_pct"],
                semantic_ops_vs_single_issue_ratio=result["semantic_ops_vs_single_issue_ratio"],
                vpu_semantic_floor_pct=result["vpu_semantic_floor_pct"],
                bootstrap_reps_per_s=result["bootstrap_reps_per_s"],
                bootstrap_n_fail=result["bootstrap_n_fail"],
                bootstrap_n_at_floor=result["bootstrap_n_at_floor"],
                bootstrap_phase_walls=result["bootstrap_phase_walls"],
                bootstrap_fast_iters=result["bootstrap_fast_iters"],
                bootstrap_exact_iters_mean=result["bootstrap_exact_iters_mean"],
                bootstrap_exact_iters_max=result.get("bootstrap_exact_iters_max"),
                bootstrap_exact_sweep_deltas=result.get(
                    "bootstrap_exact_sweep_deltas"
                ),
                bootstrap_sigma_finite=result["bootstrap_sigma_finite"],
                bootstrap_reftol_reps_per_s=result.get(
                    "bootstrap_reftol_reps_per_s"
                ),
                bootstrap_reftol_n_fail=result.get("bootstrap_reftol_n_fail"),
                bootstrap_reftol_max_dev_vs_tight=result.get(
                    "bootstrap_reftol_max_dev_vs_tight"
                ),
                bootstrap_mesh_reps_per_s=result["bootstrap_mesh_reps_per_s"],
                bootstrap_mesh_n_fail=result["bootstrap_mesh_n_fail"],
                bootstrap_mesh_max_dev=result["bootstrap_mesh_max_dev"],
                cov_s=result["cov_s"],
                expectations_s=result["expectations_s"],
                expectations_all_states_s=result["expectations_all_states_s"],
                entropy_s=result["entropy_s"],
                overlap_s=result["overlap_s"],
                neff_s=result["neff_s"],
                sigma_rel_err_streamed_vs_f64=result[
                    "sigma_rel_err_streamed_vs_f64"
                ],
                k4096_solve_s=result["k4096_solve_s"],
                k4096_gnorm=result["k4096_gnorm"],
                k4096_gnorm_per_sample=result["k4096_gnorm_per_sample"],
                k4096_delta_f_rmse_vs_analytic=result["k4096_delta_f_rmse_vs_analytic"],
                k4096_wsum_gb_s=result["k4096_wsum_gb_s"],
                k4096_ceiling_gelem_s=result["k4096_ceiling_gelem_s"],
                k4096_roofline_pct=result["k4096_roofline_pct"],
                fes_mbar_s=result["fes_mbar_s"],
                fes_histogram_s=result["fes_histogram_s"],
                fes_kde_s=result["fes_kde_s"],
                fes_spline_s=result["fes_spline_s"],
                fes_hist_rmse_vs_analytic=result["fes_hist_rmse_vs_analytic"],
                baseline="reference pymbar jax-cpu, N/10 scaled x10",
            )
        )
    )


if __name__ == "__main__":
    main()
