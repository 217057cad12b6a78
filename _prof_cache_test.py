import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
M = 7_200_000
f = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0][::100000])
ks = [jnp.asarray(rng.integers(0, 2**30, M).astype(np.int32)) for _ in range(9)]
o = f(ks[0]); jax.block_until_ready(o)
# same input every call
t0=time.perf_counter()
for _ in range(8): o = f(ks[0])
jax.block_until_ready(o)
print(f"sort same-input: {(time.perf_counter()-t0)/8*1e3:.2f} ms", flush=True)
# different input each call
t0=time.perf_counter()
outs = [f(k) for k in ks[1:]]
jax.block_until_ready(outs)
print(f"sort diff-input: {(time.perf_counter()-t0)/8*1e3:.2f} ms", flush=True)
# different input, serialized by blocking each call
t0=time.perf_counter()
for k in ks[1:]:
    jax.block_until_ready(f(k))
print(f"sort diff-input blocked: {(time.perf_counter()-t0)/8*1e3:.2f} ms", flush=True)
