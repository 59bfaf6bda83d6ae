import time, numpy as np, jax, jax.numpy as jnp

def marginal(f, init, n1=3, n2=13):
    def run(iters):
        cur = init
        t0=time.perf_counter()
        for _ in range(iters):
            cur = f(cur)
        jax.tree.map(np.asarray, cur)
        return time.perf_counter()-t0
    _ = jax.tree.map(np.asarray, f(init))
    t1, t2 = run(n1), run(n2)
    return (t2-t1)/(n2-n1)

N = 262144
key = jax.random.PRNGKey(0)
for B, C in [(163840, 12), (163840, 1), (20480, 12), (2048, 12)]:
    tab = jax.random.normal(key, (B, C), jnp.float32)
    idx0 = jax.random.randint(key, (N,), 0, B, jnp.int32)
    @jax.jit
    def g(idx, tab):
        out = jnp.take(tab, idx, axis=0)
        return (idx + out[:, 0].astype(jnp.int32)) % B
    dt = marginal(lambda i: g(i, tab), idx0)
    print(f"gather [{N}] from [{B},{C}]: {dt*1e6:.1f} us")

# dynamic_slice style: 8 scalar rows (like leaf triangle loads)
tab = jax.random.normal(key, (81920, 12), jnp.float32)
idx0 = jax.random.randint(key, (N,), 0, 81920, jnp.int32)
@jax.jit
def g2(idx, tab):
    acc = jnp.zeros((N,), jnp.float32)
    for j in range(4):
        rows = jnp.take(tab, jnp.clip(idx + j, 0, 81919), axis=0)
        acc = acc + rows[:, 0]
    return (idx + acc.astype(jnp.int32)) % 81920
dt = marginal(lambda i: g2(i, tab), idx0)
print(f"4x gather [{N}] from [81920,12]: {dt*1e6:.1f} us")
