"""Measure the round-5 scatter-free voxel_downsample vs the scatter path.

The memory_voxel_update harvest (tools/profile_voxel_update.py) showed
segment_sum scatter is the TPU bottleneck of the voxel pipeline; plain
``voxel_downsample`` kept the lexsort + 3 gathers + 2 segment_sums until
round 5. This probe times, at the two production shapes that still hit it:

  gt        unbatched (65536, 3) at voxel 0.025 — the generate_gt
            per-scene cloud downsample (gt.py::_voxel_fn)
  save      batched (8, 262144, 3) at voxel 0.025 — the Tester
            save_downsample of the full scene memory (tester.py)

variants:
  scatter   the pre-round-5 path (lexsort + segment_sum), via
            P._voxel_downsample_scatter
  packed    the scan path via the public API (includes the lax.cond)

plus set-parity scatter vs packed at both shapes.

Timing discipline per CLAUDE.md: vary inputs >=1% per rep (the tunnel
memoizes identical calls), sync via a value transfer, min-of-3.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pointreggpt_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

VOXEL = 0.025


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timed(label, fn, n=3):
    fn(0)
    ts = []
    for i in range(1, n + 1):
        t0 = time.time()
        fn(i)
        ts.append(time.time() - t0)
    print(f"{label}: {['%.4f' % t for t in ts]} min {min(ts):.4f}s",
          flush=True)
    return min(ts)


def parity(ref, new, batch):
    # BOTH paths emit voxel order (valid prefix), so compare IN ORDER.
    # Do NOT set-compare via a coordinate lexsort: near-tied float keys
    # (e.g. two centroids at z=0.500004 vs 0.500006) reorder between the
    # two result sets under their fp-noise differences and misalign rows.
    rp, rv = map(np.asarray, ref)
    np_, nv = map(np.asarray, new)
    np.testing.assert_array_equal(rv, nv)
    np.testing.assert_allclose(rp, np_, atol=1e-5)


def main():
    from pointreggpt_tpu.core import pointops as P

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # ---- gt shape: one (65536,) cloud in a ~3 m room shell ----------------
    n = 65536
    pts = rng.uniform(-1.6, 1.6, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 3.5, n)
    val = rng.random(n) < 0.9
    p1, v1 = jnp.asarray(pts), jnp.asarray(val)

    @jax.jit
    def gt_scatter(p, v):
        q, _ = P._quantize(p[None], v[None], VOXEL, None)
        return P._voxel_downsample_scatter(p, v, q[0])

    @jax.jit
    def gt_packed(p, v):
        return P.voxel_downsample(p, v, VOXEL)

    t_gs = timed("gt   scatter (old path)",
                 lambda i: sync(gt_scatter(p1 * (1 + 0.01 * i), v1)[0]))
    t_gp = timed("gt   packed  (public API)",
                 lambda i: sync(gt_packed(p1 * (1 + 0.01 * i), v1)[0]))
    parity(gt_scatter(p1, v1), gt_packed(p1, v1), 1)
    print(f"gt   speedup {t_gs / t_gp:.2f}x", flush=True)

    # ---- save shape: (8, 262144) full scene memories ----------------------
    b, m = 8, 1 << 18
    bpts = rng.uniform(-1.6, 1.6, (b, m, 3)).astype(np.float32)
    bpts[..., 2] = rng.uniform(0.5, 3.5, (b, m))
    bval = rng.random((b, m)) < 0.9
    p2, v2 = jnp.asarray(bpts), jnp.asarray(bval)

    @jax.jit
    def save_scatter(p, v):
        q, _ = P._quantize(p, v, VOXEL, None)
        return jax.vmap(P._voxel_downsample_scatter)(p, v, q)

    @jax.jit
    def save_packed(p, v):
        return P.voxel_downsample_batched(p, v, VOXEL)

    t_ss = timed("save scatter (old path)",
                 lambda i: sync(save_scatter(p2 * (1 + 0.01 * i), v2)[0]))
    t_sp = timed("save packed  (batched API)",
                 lambda i: sync(save_packed(p2 * (1 + 0.01 * i), v2)[0]))
    parity(save_scatter(p2, v2), save_packed(p2, v2), b)
    print(f"save speedup {t_ss / t_sp:.2f}x", flush=True)

    print("\n--- summary ---", flush=True)
    print(f"gt (1x65536):   scatter {t_gs:.4f}s -> packed {t_gp:.4f}s "
          f"({t_gs / t_gp:.2f}x)", flush=True)
    print(f"save (8x262144): scatter {t_ss:.4f}s -> packed {t_sp:.4f}s "
          f"({t_ss / t_sp:.2f}x)", flush=True)
    print("VOXEL DOWNSAMPLE PROBE OK", flush=True)


if __name__ == "__main__":
    main()
