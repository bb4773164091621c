"""Compare Upsample formulations at the U-Net's three upsample shapes.

  repeat  — nearest-2x repeat + SAME conv3x3 at the upsampled resolution
  phases  — 4 subpixel-phase 2x2 convs at low res + interleave reshape
  dilated — ONE input-dilated conv: kernel K4 = W (*) ones(2,2) (4x4),
            lhs_dilation=2, padding (2,2) — algebraically identical

VARIATION NOTE: inputs vary by >=1% steps (bf16 cannot represent smaller).
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


def up_repeat(x, w, b):
    xu = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return lax.conv_general_dilated(
        xu, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=DN) + b.astype(x.dtype)


def up_phases(x, w, bias):
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]

    def rg(k, a):
        return (jnp.stack([k[0], k[1] + k[2]]) if a == 0
                else jnp.stack([k[0] + k[1], k[2]]))

    bias_c = bias.astype(x.dtype)
    phases = []
    for a in (0, 1):
        kr = rg(w, a)
        row = []
        for bb in (0, 1):
            k2 = jnp.stack([rg(kr[0], bb), rg(kr[1], bb)])
            y = lax.conv_general_dilated(
                x, k2.astype(x.dtype), (1, 1),
                padding=((1 - a, a), (1 - bb, bb)),
                dimension_numbers=DN)
            row.append(y + bias_c)
        phases.append(jnp.stack(row))
    t = jnp.stack(phases).transpose(2, 3, 0, 4, 1, 5)
    return t.reshape(bsz, 2 * h, 2 * wd, cout)


def up_dilated(x, w, bias):
    # K4[p,q] = sum_{a,b in {0,1}} W[p-a, q-b] (zero outside) = W (*) ones2x2
    k4r = jnp.pad(w, ((0, 1), (0, 0), (0, 0), (0, 0))) + \
        jnp.pad(w, ((1, 0), (0, 0), (0, 0), (0, 0)))   # (4,3,ci,co)
    k4 = jnp.pad(k4r, ((0, 0), (0, 1), (0, 0), (0, 0))) + \
        jnp.pad(k4r, ((0, 0), (1, 0), (0, 0), (0, 0)))  # (4,4,ci,co)
    return lax.conv_general_dilated(
        x, k4.astype(x.dtype), (1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=DN) + bias.astype(x.dtype)


def bench(fn, x, w, b, reps=3):
    @jax.jit
    def chain(eps, x, w, b):
        def body(acc, i):
            out = fn((x * (eps + i * 0.01)).astype(x.dtype), w, b)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        out, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return out

    jax.block_until_ready(chain(jnp.float32(1.0), x, w, b))
    ts = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(
            chain(jnp.float32(1.0 + 0.01 * (i + 1)), x, w, b))
        ts.append(time.time() - t0)
    return min(ts) / K


def main():
    log(f"backend={jax.default_backend()} batch={B}")
    rng = np.random.default_rng(0)
    for (res, cin, cout) in [(32, 512, 256), (64, 256, 128), (128, 128, 64)]:
        x = jnp.asarray(rng.normal(size=(B, res, res, cin)), DT)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05,
                        jnp.float32)
        b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
        ref = np.asarray(up_repeat(x, w, b), np.float32)
        for name, fn in [("repeat", up_repeat), ("phases", up_phases),
                         ("dilated", up_dilated)]:
            got = np.asarray(fn(x, w, b), np.float32)
            err = np.abs(got - ref).max() / max(1e-6, np.abs(ref).max())
            t = bench(fn, x, w, b)
            log(f"up {cin}->{cout} @{res}: {name} {1000*t:.3f} ms "
                f"(err {err:.1e})")


if __name__ == "__main__":
    main()
