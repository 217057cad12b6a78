"""Trustworthy TPU timing harness for the axon tunnel.

``jax.block_until_ready`` does not reliably await execution through the
tunnel (measured: a 921k-row scatter "completes" in 0.03 ms until a host
read forces it, then costs >100 ms), so every measurement here:

  1. runs K iterations of the op *inside one jit* via lax.fori_loop,
  2. chains each iteration's input on the previous output (defeating
     dedup/caching and any lazy completion),
  3. ends with a single scalar host read, and
  4. reports (t(K) - t(K0)) / (K - K0) to cancel dispatch + read overhead.

Use ``chain_time(op, seed_args, ...)`` where op maps (carry, *args) ->
new scalar carry that depends on the op's real output.
"""

import time

import jax
import jax.numpy as jnp


def chain_time(op, args, k: int = 8, k0: int = 2) -> float:
    """Per-iteration milliseconds of ``op(carry, *args) -> carry`` with a
    data dependency between iterations."""

    def runner(n):
        @jax.jit
        def run(args):
            def body(i, carry):
                return op(carry + 1e-12 * i, *args)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    run_k = runner(k)
    run_k0 = runner(k0)
    # warm both executables (incl. the forced read)
    float(run_k(args))
    float(run_k0(args))

    def best_of(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tk = best_of(run_k)
    tk0 = best_of(run_k0)
    return (tk - tk0) / (k - k0) * 1e3
