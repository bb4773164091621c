"""Variant benches for init_conv7 (1->64) and Downsample (4x4 s2).

  floor      — trivial op (per-chain overhead floor to subtract)
  conv7      — nn-style lax conv 7x7 SAME, cin=1
  conv7_i2c  — conv_general_dilated_patches (49 ch) + dot
  down4      — lax conv 4x4 stride 2 pad 1
  down4_phases  — space-to-depth(2) + conv 2x2 stride 1 (4*cin channels, exact)

VARIATION NOTE: inputs vary by >=1% (bf16); float() forces the transfer.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pointreggpt_xla"))

import jax.numpy as jnp
import numpy as np
from jax import lax

B, K = 8, 16
DT = jnp.bfloat16
DN = ("NHWC", "HWIO", "NHWC")


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench(fn, *args, reps=3):
    @jax.jit
    def chain(eps, *args):
        def body(acc, i):
            out = fn((args[0] * (eps + i * 0.01)).astype(args[0].dtype),
                     *args[1:])
            return acc + jnp.sum(out.astype(jnp.float32)), None
        out, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return out

    float(chain(jnp.float32(1.0), *args))
    ts = []
    for i in range(reps):
        t0 = time.time()
        float(chain(jnp.float32(1.0 + 0.01 * (i + 1)), *args))
        ts.append(time.time() - t0)
    return min(ts) / K


def conv7(x, w, b):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=DN) + b.astype(x.dtype)


def conv7_i2c(x, w, b):
    # patches: (b, h, w, 49*cin) for a 7x7 window (cin=1)
    p = lax.conv_general_dilated_patches(
        x, (7, 7), (1, 1), "SAME", dimension_numbers=DN)
    return jnp.dot(p, w.reshape(-1, w.shape[-1]).astype(x.dtype)) + \
        b.astype(x.dtype)


def down4(x, w, b):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=DN) + b.astype(x.dtype)


def down4_phases(x, w, b):
    """4x4 stride-2 pad-1 conv as 4 polyphase 2x2 stride-1 convs (exact).

    Output(i,j) reads input rows m = 2i-1+p. Even-row phase (m = 2m'):
    p in {1,3} -> taps [i, i+1] with W[1], W[3], pad (0,1); odd-row phase:
    p in {0,2} -> taps [i-1, i] with W[0], W[2], pad (1,0). Same for
    columns; the four phase convs (2,2,cin,cout) sum into the output. Same
    FLOPs, but each MXU pass contracts over 4*cin lanes instead of cin.
    """
    bsz, h, wd, cin = x.shape
    acc = None
    for a in (0, 1):          # input row parity
        rows = x[:, a::2]
        kr = w[1::2] if a == 0 else w[0::2]   # (2, 4, cin, cout)
        pr = (0, 1) if a == 0 else (1, 0)
        for c in (0, 1):      # input col parity
            xp = rows[:, :, c::2]
            k2 = kr[:, 1::2] if c == 0 else kr[:, 0::2]  # (2,2,cin,cout)
            pc = (0, 1) if c == 0 else (1, 0)
            y = lax.conv_general_dilated(
                xp, k2.astype(x.dtype), (1, 1), (pr, pc),
                dimension_numbers=DN)
            acc = y if acc is None else acc + y
    return acc + b.astype(x.dtype)


def main():
    log(f"backend={jax.default_backend()} batch={B}")
    rng = np.random.default_rng(0)

    t_floor = bench(lambda x: x * 2.0,
                    jnp.asarray(rng.normal(size=(8, 8)), DT))
    log(f"floor: {1000*t_floor:.3f} ms")

    x1 = jnp.asarray(rng.normal(size=(B, 256, 256, 1)), DT)
    w7 = jnp.asarray(rng.normal(size=(7, 7, 1, 64)) * 0.1, jnp.float32)
    b7 = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    ref = np.asarray(conv7(x1, w7, b7), np.float32)
    for name, fn in [("conv7", conv7), ("conv7_i2c", conv7_i2c)]:
        got = np.asarray(fn(x1, w7, b7), np.float32)
        err = np.abs(got - ref).max() / max(1e-6, np.abs(ref).max())
        t = bench(fn, x1, w7, b7)
        log(f"init 1->64 @256 {name}: {1000*t:.3f} ms (err {err:.1e})")

    for (res, cin, cout) in [(256, 64, 128), (128, 64, 256),
                             (64, 128, 512)]:
        x = jnp.asarray(rng.normal(size=(B, res, res, cin)), DT)
        w = jnp.asarray(rng.normal(size=(4, 4, cin, cout)) * 0.05,
                        jnp.float32)
        b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
        ref = np.asarray(down4(x, w, b), np.float32)
        for name, fn in [("down4", down4), ("down4_phases", down4_phases)]:
            got = np.asarray(fn(x, w, b), np.float32)
            err = np.abs(got - ref).max() / max(1e-6, np.abs(ref).max())
            t = bench(fn, x, w, b)
            log(f"down {cin}->{cout} @{res} {name}: {1000*t:.3f} ms "
                f"(err {err:.1e})")


if __name__ == "__main__":
    main()
