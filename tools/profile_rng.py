"""Measure PRNG cost in the sampling chain: threefry vs TPU hardware RNG.

Every DDIM step draws one (b, 256, 256, 1) normal plus a dropout uniform
(diffusion/gaussian.py:364-376). JAX's default threefry2x32 computes the
bits on the VPU (counter-based hashing); the ``rbg`` implementation lowers
to the TPU's hardware RNG instruction and is typically far cheaper. The
sampler inherits whichever implementation the *caller's key* carries, so
if the delta matters the switch is one line in the drivers.

Times K-step scans that split + draw exactly like the ddim body, for both
key impls, plus the same scan with the draw replaced by a broadcast (the
floor). Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_rng.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PRGPT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PRGPT_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pointreggpt_xla"))

import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("PRGPT_RNG_B", 8))
K = int(os.environ.get("PRGPT_RNG_K", 250))
RES = int(os.environ.get("PRGPT_RNG_RES", 256))
SHAPE = (B, RES, RES, 1)


def log(m):
    print(m, file=sys.stderr, flush=True)


def chain(key, x0):
    """K ddim-like steps: split -> dropout uniform -> normal -> update."""
    keys = jax.random.split(key, K)

    def body(x, k):
        k_drop, k_noise = jax.random.split(k)
        u = jax.random.uniform(k_drop, (B, RES, RES))
        noise = jax.random.normal(k_noise, SHAPE, jnp.float32)
        x = x * 0.99 + noise * 0.01 + u[..., None] * 1e-6
        return x, None

    out, _ = jax.lax.scan(body, x0, keys)
    return jnp.sum(out)


def chain_floor(key, x0):
    """Same scan with the draws replaced by broadcasts (scan overhead)."""
    keys = jax.random.split(key, K)

    def body(x, k):
        x = x * 0.99 + 0.01
        return x, None

    out, _ = jax.lax.scan(body, x0, keys)
    return jnp.sum(out)


def timeit(name, fn, key):
    f = jax.jit(fn)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    float(f(key, x))  # warm
    ts = []
    for i in range(5):
        xi = x * (1.0 + 0.01 * (i + 1))  # vary (tunnel memoization)
        t0 = time.time()
        float(f(key, xi))
        ts.append(time.time() - t0)
    t = min(ts) / K
    log(f"{name}: {1000 * t:.4f} ms/step")
    return t


def main():
    log(f"backend={jax.default_backend()} shape={SHAPE} K={K}")
    k_tf = jax.random.PRNGKey(0)
    k_rbg = jax.random.key(0, impl="rbg")

    t_floor = timeit("floor (no draws)     ", chain_floor, k_tf)
    t_tf = timeit("threefry2x32 (default)", chain, k_tf)
    t_rbg = timeit("rbg (hardware RNG)    ", chain, k_rbg)
    log(f"RNG cost/step: threefry {1000 * (t_tf - t_floor):.4f} ms, "
        f"rbg {1000 * (t_rbg - t_floor):.4f} ms; "
        f"switching saves {1000 * (t_tf - t_rbg):.4f} ms/step "
        f"-> {(t_tf - t_rbg) * 250 * 1000:.1f} ms per 250-step chain")


if __name__ == "__main__":
    main()
