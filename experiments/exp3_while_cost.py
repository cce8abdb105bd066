"""Is a data-dependent while_loop host-synced on the axon tunnel?

Compares: (a) fori_loop with static K; (b) while_loop whose condition is
statically K iterations but written data-dependently; (c) while_loop with
a genuinely data-dependent (input-derived) iteration count. Same trivial
body. If (b)/(c) cost ~RTT per iteration, whiles are host-synced.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)

N = 8192
K = 200


def timed(f, args_list, n=3):
    float(f(*args_list[0]).sum())
    t0 = time.perf_counter()
    for i in range(n):
        r = f(*args_list[i % len(args_list)])
        float(r.sum())
    return (time.perf_counter() - t0) / n


xs = [jnp.asarray(np.random.rand(N).astype(np.float32) + 1.0)
      for _ in range(3)]

# (a) fori, static K
fa = jax.jit(lambda x: jax.lax.fori_loop(
    0, K, lambda i, c: c * 1.000001 + 1e-6, x))
print(f"fori static K={K}: {timed(fa, [(x,) for x in xs])*1e3:.1f} ms",
      flush=True)

# (b) while, counter-based (statically K but via while)
def fb(x):
    def cond(c):
        return c[1] < K
    def body(c):
        return c[0] * 1.000001 + 1e-6, c[1] + 1
    return jax.lax.while_loop(cond, body, (x, 0))[0]
print(f"while counter K={K}: {timed(jax.jit(fb), [(x,) for x in xs])*1e3:.1f}"
      " ms", flush=True)

# (c) while, genuinely data-dependent count (~K iterations)
def fc(x):
    # sum grows until it exceeds a threshold derived from the input
    def cond(c):
        return c[0][0] < c[1]
    def body(c):
        y = c[0] * 1.0001 + 1e-4
        return (y, c[1])
    thr = x[0] + 0.0205  # ~K iterations of +1e-4
    return jax.lax.while_loop(cond, body, (x, thr))[0]
t = timed(jax.jit(fc), [(x,) for x in xs])
print(f"while data-dependent ~205 iters: {t*1e3:.1f} ms "
      f"({t/205*1e3:.2f} ms/iter)", flush=True)

# (d) while, data-dependent with a reduction cond (like any())
def fd(x):
    def cond(c):
        return jnp.any(c[0] < c[1])
    def body(c):
        return (c[0] * 1.0001 + 1e-4, c[1])
    thr = x + 0.0205
    return jax.lax.while_loop(cond, body, (x, thr))[0]
t = timed(jax.jit(fd), [(x,) for x in xs])
print(f"while any()-cond ~205 iters: {t*1e3:.1f} ms "
      f"({t/205*1e3:.2f} ms/iter)", flush=True)
print("DONE", flush=True)
