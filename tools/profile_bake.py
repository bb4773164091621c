"""Measure baked inference params (models/bake.py) vs the fp32 per-step path.

Inside the 250-step DDIM scan every U-Net step re-reads the fp32 params
(~148 MB), re-standardizes each WSConv kernel, and casts to bf16 — all
loop-invariant work. XLA's while-loop LICM may or may not hoist it. This
probe times the production-shape U-Net forward chained K steps:

  A) unbaked: fp32 params, standardize+cast inside every step
  B) baked: `bake_inference_params` (pre-standardized + pre-cast bf16
     kernels ONCE; WSConv's dtype-gate skips in-step standardization) —
     what Generator/Tester/MaskTester now do at load time.

Weights agree with the in-step path to one bf16 ulp (lax.rsqrt is an
approximate intrinsic — see models/bake.py); the probe asserts the
forward outputs stay within bf16 noise on chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_bake.py

VARIATION NOTE: timed inputs vary by >=1% per rep (bf16 + tunnel
memoization, see CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PRGPT_PLATFORM"):  # e.g. cpu smoke-testing the script
    jax.config.update("jax_platforms", os.environ["PRGPT_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pointreggpt_xla"))

import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.models import DiffusionUNet
from pointreggpt_tpu.models.bake import BF16_NOISE_REL, bake_inference_params

B = int(os.environ.get("PRGPT_BAKE_B", 8))
K = int(os.environ.get("PRGPT_BAKE_K", 16))
DIM = int(os.environ.get("PRGPT_BAKE_DIM", 64))
RES = int(os.environ.get("PRGPT_BAKE_RES", 256))
DT = jnp.bfloat16


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"backend={jax.default_backend()} batch={B} K={K} dim={DIM} res={RES}")

    model = DiffusionUNet(dim=DIM, param_cond_dim=4, dim_mults=(1, 2, 4, 8),
                          channels=1, dtype=DT)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, RES, RES, 1)), jnp.float32)
    tt = jnp.full((B,), 500.0, jnp.float32)
    pc = jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, tt, pc)

    # host-side numpy bake, then device_put ONCE like every production
    # consumer (Generator/Tester replicate, MaskTester/bench device_put) —
    # timing the raw numpy tree instead measures a ~74 MB param re-upload
    # per call (145.8 vs 28.7 ms/step through the tunnel)
    baked = jax.device_put(bake_inference_params(params, DT))

    # parity within bf16 noise: one jitted forward through each path
    fwd = jax.jit(lambda p, x: model.apply(p, x, tt, pc))
    ya = np.asarray(fwd(params, x), np.float32)
    yb = np.asarray(fwd(baked, x), np.float32)
    d = np.abs(ya - yb).max()
    scale = max(abs(ya).max(), 1e-3)
    assert d <= BF16_NOISE_REL * scale, (d, scale)
    log(f"parity: baked forward within bf16 noise "
        f"(max|d|={d:.2e}, scale={scale:.2f})")

    def chain(eps, p, x):
        def body(acc, i):
            out = model.apply(p, x * (eps + i * 0.01), tt, pc)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return out

    chain_j = jax.jit(chain)

    def timeit(name, p):
        float(chain_j(jnp.float32(1.0), p, x))  # warm
        ts = []
        for i in range(5):
            t0 = time.time()
            float(chain_j(jnp.float32(1.0 + 0.01 * (i + 1)), p, x))
            ts.append(time.time() - t0)
        t = min(ts) / K
        log(f"{name}: {1000*t:.3f} ms/step")
        return t

    ta = timeit("A fp32 params (standardize in-step)", params)
    tb = timeit("B baked bf16 params              ", baked)
    log(f"delta: {1000*(ta-tb):.3f} ms/step "
        f"({100*(ta-tb)/ta:.2f}%) -> {(ta-tb)*250*1000:.0f} ms per "
        f"250-step chain")


if __name__ == "__main__":
    main()
