"""Microbenchmark: Mosaic per-loop-trip overhead inside a Pallas kernel.

Kernel A: fori_loop of N trivial iterations on a (10,128) carry.
Kernel B: same with unroll=8.
Kernel C: 8x more work per trip, N/8 trips (manual amortization).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/loop_overhead_r5.py
"""

import os
import time

if "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=131072").strip()

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1000

    def make(unroll, body_reps):
        def kernel(x_ref, o_ref):
            def one(z):
                for _ in range(body_reps):
                    z = z * 0.999 + 0.001
                    z = z + jnp.max(z, axis=0, keepdims=True) * 1e-6
                return z

            def body(i, z):
                return one(z)

            z = jax.lax.fori_loop(0, N // body_reps, body, x_ref[...],
                                  unroll=unroll)
            o_ref[...] = z

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((10, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        return run

    import numpy as np
    x = jnp.asarray(np.random.RandomState(0).rand(10, 128), jnp.float32)
    for name, unroll, reps in (("plain", 1, 1), ("reps8", 1, 8)):
        run = make(unroll, reps)
        r = run(x)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(20):
            r = run(x)
            jax.block_until_ready(r)
        dt = (time.time() - t0) / 20
        print("%-8s  %8.3f ms total,  %7.3f us per logical iteration"
              % (name, 1e3 * dt, 1e6 * dt / N), flush=True)

    # while_loop version (the kernel's early-exit structure)
    def make_while():
        def kernel(x_ref, o_ref):
            def cond(c):
                i, z = c
                return i < N

            def body(c):
                i, z = c
                z = z * 0.999 + 0.001
                z = z + jnp.max(z, axis=0, keepdims=True) * 1e-6
                return i + 1, z

            _, z = jax.lax.while_loop(cond, body,
                                      (jnp.asarray(0, jnp.int32),
                                       x_ref[...]))
            o_ref[...] = z

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((10, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        return run

    run = make_while()
    r = run(x)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(20):
        r = run(x)
        jax.block_until_ready(r)
    dt = (time.time() - t0) / 20
    print("%-8s  %8.3f ms total,  %7.3f us per logical iteration"
          % ("while", 1e3 * dt, 1e6 * dt / N), flush=True)


if __name__ == "__main__":
    main()
