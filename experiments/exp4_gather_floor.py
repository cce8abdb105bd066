"""Fixed-cost floor of gather ops vs one-hot matmul fetch, in-loop."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)


def marginal(mk, K=64, n=2):
    fa, fb = jax.jit(mk(K)), jax.jit(mk(2 * K))
    x0 = jnp.asarray(np.random.rand(8).astype(np.float32))
    float(fa(x0).sum()); float(fb(x0).sum())
    t0 = time.perf_counter()
    for i in range(n):
        float(fa(x0 + i).sum())
    ta = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for i in range(n):
        float(fb(x0 + i).sum())
    tb = (time.perf_counter() - t0) / n
    return (tb - ta) / K


# 1. Gather floor: vary number of gathered rows P, small table.
tab8 = jnp.asarray(np.random.rand(16384, 8).astype(np.float32))
tab128 = jnp.asarray(np.random.rand(8192, 128).astype(np.float32))
for P in (1024, 14400, 57600, 230400):
    def mk(K, P=P):
        idx0 = jnp.asarray(np.random.randint(0, 16384, P).astype(np.int32))
        def f(x):
            def body(i, c):
                idx, acc = c
                rows = jnp.take(tab8, idx, axis=0)
                return (idx + 7) % 16384, acc + rows[:, 0]
            return jax.lax.fori_loop(0, K, body,
                                     (idx0, jnp.zeros(P) + x[0]))[1]
        return f
    t = marginal(mk)
    print(f"gather8 P={P:7d}: {t*1e6:8.1f} us/iter", flush=True)

# 2. Two gathers per iter (node + cluster), like the real kernel.
for P in (14400, 57600):
    def mk(K, P=P):
        idx0 = jnp.asarray(np.random.randint(0, 8192, P).astype(np.int32))
        def f(x):
            def body(i, c):
                idx, acc = c
                rows = jnp.take(tab8, idx % 16384, axis=0)
                crow = jnp.take(tab128, idx, axis=0)
                return ((idx + 7) % 8192,
                        acc + rows[:, 0] + crow[:, 0] + crow[:, 64])
            return jax.lax.fori_loop(0, K, body,
                                     (idx0, jnp.zeros(P) + x[0]))[1]
        return f
    t = marginal(mk)
    print(f"gather8+128 P={P:7d}: {t*1e6:8.1f} us/iter", flush=True)

# 3. One-hot matmul fetch of node rows: [P,M]@[M,8].
for P, M in ((3600, 16384), (14400, 16384)):
    def mk(K, P=P, M=M):
        idx0 = jnp.asarray(np.random.randint(0, M, P).astype(np.int32))
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        def f(x):
            def body(i, c):
                idx, acc = c
                onehot = (idx[:, None] == iota).astype(jnp.bfloat16)
                rows = jnp.dot(onehot, tab8.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                return (idx + 7) % M, acc + rows[:, 0]
            return jax.lax.fori_loop(0, K, body,
                                     (idx0, jnp.zeros(P) + x[0]))[1]
        return f
    t = marginal(mk, K=32)
    print(f"onehot@[{M},8] P={P:6d}: {t*1e6:8.1f} us/iter", flush=True)

# 4. Column-slice style (SoA cluster MT) vs reshape style on a gathered row.
for style in ("slices", "reshape"):
    def mk(K, style=style):
        P = 14400
        idx0 = jnp.asarray(np.random.randint(0, 8192, P).astype(np.int32))
        def f(x):
            def body(i, c):
                idx, acc = c
                crow = jnp.take(tab128, idx, axis=0)   # [P, 128]
                if style == "slices":
                    s = jnp.zeros(P)
                    for k in range(8):
                        for j in range(13):
                            s = s + crow[:, k * 16 + j]
                else:
                    r = crow.reshape(P, 8, 16)
                    s = r[:, :, :13].sum(axis=(1, 2))
                return (idx + 7) % 8192, acc + s
            return jax.lax.fori_loop(0, K, body,
                                     (idx0, jnp.zeros(P) + x[0]))[1]
        return f
    t = marginal(mk, K=32)
    print(f"cluster read style={style}: {t*1e6:8.1f} us/iter", flush=True)

print("DONE", flush=True)
