import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
M = 7_200_000
w = jnp.asarray(rng.random(M, dtype=np.float32))
f = jax.jit(lambda k: jnp.sum(jax.lax.sort((k,), num_keys=1)[0].astype(jnp.float32) * w))
ks = [jnp.asarray(rng.integers(0, 2**30, M).astype(np.int32)) for _ in range(9)]
o = f(ks[0]); jax.block_until_ready(o)
t0=time.perf_counter()
for k in ks[1:]:
    jax.block_until_ready(f(k))
print(f"full sort weighted-sum: {(time.perf_counter()-t0)/8*1e3:.2f} ms", flush=True)

g = jax.jit(lambda k, v: (lambda s, sv: jnp.sum(sv.astype(jnp.float32) * w) + jnp.sum(s.astype(jnp.float32) * w))(*jax.lax.sort((k, v), num_keys=1)))
vv = jnp.arange(M, dtype=jnp.int32)
o = g(ks[0], vv); jax.block_until_ready(o)
t0=time.perf_counter()
for k in ks[1:]:
    jax.block_until_ready(g(k, vv))
print(f"pair sort weighted-sum: {(time.perf_counter()-t0)/8*1e3:.2f} ms", flush=True)

# 2.7M single
M2 = 2_700_000
w2 = jnp.asarray(rng.random(M2, dtype=np.float32))
f2 = jax.jit(lambda k: jnp.sum(jax.lax.sort((k,), num_keys=1)[0].astype(jnp.float32) * w2))
ks2 = [jnp.asarray(rng.integers(0, 2**30, M2).astype(np.int32)) for _ in range(9)]
o = f2(ks2[0]); jax.block_until_ready(o)
t0=time.perf_counter()
for k in ks2[1:]:
    jax.block_until_ready(f2(k))
print(f"2.7M sort weighted-sum: {(time.perf_counter()-t0)/8*1e3:.2f} ms", flush=True)
