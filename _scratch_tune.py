import time, numpy as np, jax, jax.numpy as jnp
import pymbar_tpu
from pymbar_tpu.ops import pallas_kernels as pk

K4, N4 = 4096, 1 << 18
with jax.enable_x64(False):
    u = jax.random.normal(jax.random.PRNGKey(0), (K4, N4), jnp.float32) * 3.0
ul4 = jnp.zeros_like(u)
g = jnp.zeros(K4, jnp.float32); gl4 = jnp.zeros_like(g)
jax.block_until_ready(u)
def _fence(x):
    float(np.asarray(x[0][0] if isinstance(x, tuple) else x[0]))

for kblk in (256, 512, 1024):
    pk._WSUM_BIG_KBLK = kblk
    fn = jax.jit(lambda uu, ll, gg, ggl: pk._wsum_big(uu, ll, gg, ggl, None, 128, False, True))
    try:
        out = fn(u, ul4, g, gl4); _fence(out)
        t0 = time.time()
        for _ in range(3): out = fn(u, ul4, g, gl4)
        _fence(out)
        dt = (time.time() - t0) / 3
        print(f"k_blk={kblk}: {dt*1e3:.1f} ms = {K4*N4*8/dt/1e9:.1f} GB/s", flush=True)
    except Exception as e:
        print(f"k_blk={kblk}: FAIL {str(e)[:160]}", flush=True)
