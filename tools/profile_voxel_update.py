"""Harvest probe: the scene-memory voxel update vs its sort floor.

VERDICT r4 next #1: the memory update (concat -> voxel_downsample ->
keep_nearest) measures ~0.252 s isolated at production size (8 x 327680)
vs a 0.028 s bare-sort floor — the only quantified perf headroom left
(extras 0.328 s of the 7.216 s step; zero-cost extras = +3.2 pairs/min).

Candidates measured here, at the production config (batch 8, cap 1<<18,
new frame 65536 pts, voxel 0.002):

  base       the shipped path: vmapped voxel_downsample (3-key lexsort +
             3 gathers + segment_sum) + keep_nearest
  packA      packed 2-key (hi=qx*2^15+qy, lo=qz) int32 sort carrying iota,
             then gathers (saves one key operand + the q gather, halves
             the comparator)
  packB      packed 2-key sort CARRYING the point coords + validity
             (saves all gathers; sort moves 4 extra f32 operands)
  packB_srt  packB + segment_sum(indices_are_sorted=True)
  floors     bare 1-key sort (the written r4 floor) and bare 2-key sort
             on the same (8, 327680) set

plus a cross-variant parity check (same centroid sets as base).

Timing discipline per CLAUDE.md: vary inputs >=1% per rep (the tunnel
memoizes identical calls), sync via a forced value transfer, min-of-3.
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
from jax import lax

BATCH, CAP, NEW = 8, 1 << 18, 65536
VOXEL = 0.002
_INT_SENTINEL = np.int32(2**30)
_PACK = 1 << 15  # 32768 cells/axis = 65 m span at 2 mm voxel


def _quantize(pts, val, voxel):
    """(b, n, 3) -> packed (hi, lo) int32 key pair, invalid -> sentinel."""
    big = jnp.asarray(1e30, pts.dtype)
    masked = jnp.where(val[..., None], pts, big)
    origin = jnp.min(masked, axis=1) - 0.5 * voxel  # (b, 3)
    q = jnp.floor((pts - origin[:, None, :]) / voxel).astype(jnp.int32)
    q = jnp.clip(q, 0, _PACK - 1)
    hi = q[..., 0] * _PACK + q[..., 1]
    lo = q[..., 2]
    hi = jnp.where(val, hi, _INT_SENTINEL)
    lo = jnp.where(val, lo, _INT_SENTINEL)
    return hi, lo


def _segments(hi_s, lo_s):
    is_first = ((hi_s != jnp.roll(hi_s, 1, axis=-1)) |
                (lo_s != jnp.roll(lo_s, 1, axis=-1)))
    is_first = is_first.at[:, 0].set(True)
    seg_id = jnp.cumsum(is_first.astype(jnp.int32), axis=-1) - 1
    return seg_id


def memupd_packA(mp, mv, w, wv, voxel, cap, *, sorted_seg=False):
    pts = jnp.concatenate([mp, w], axis=1)
    val = jnp.concatenate([mv, wv], axis=1)
    b, n, _ = pts.shape
    hi, lo = _quantize(pts, val, voxel)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    hi_s, lo_s, order = lax.sort((hi, lo, iota), dimension=-1, num_keys=2)
    pts_s = jnp.take_along_axis(pts, order[..., None], axis=1)
    val_s = jnp.take_along_axis(val, order, axis=1)
    seg_id = _segments(hi_s, lo_s)
    wgt = val_s.astype(pts.dtype)

    def seg(p, wt, sid):
        sums = jax.ops.segment_sum(p * wt[:, None], sid, num_segments=n,
                                   indices_are_sorted=sorted_seg)
        counts = jax.ops.segment_sum(wt, sid, num_segments=n,
                                     indices_are_sorted=sorted_seg)
        return sums, counts

    sums, counts = jax.vmap(seg)(pts_s, wgt, seg_id)
    out_valid = counts > 0
    out = jnp.where(out_valid[..., None],
                    sums / jnp.maximum(counts, 1.0)[..., None], 0.0)
    from pointreggpt_tpu.core import pointops as P
    return P.keep_nearest(out, out_valid, cap, valid_is_prefix=True)


def memupd_packB(mp, mv, w, wv, voxel, cap, *, sorted_seg=False):
    pts = jnp.concatenate([mp, w], axis=1)
    val = jnp.concatenate([mv, wv], axis=1)
    b, n, _ = pts.shape
    hi, lo = _quantize(pts, val, voxel)
    hi_s, lo_s, x_s, y_s, z_s, w_s = lax.sort(
        (hi, lo, pts[..., 0], pts[..., 1], pts[..., 2],
         val.astype(pts.dtype)), dimension=-1, num_keys=2)
    seg_id = _segments(hi_s, lo_s)
    pts_s = jnp.stack([x_s, y_s, z_s], axis=-1)

    def seg(p, wt, sid):
        sums = jax.ops.segment_sum(p * wt[:, None], sid, num_segments=n,
                                   indices_are_sorted=sorted_seg)
        counts = jax.ops.segment_sum(wt, sid, num_segments=n,
                                     indices_are_sorted=sorted_seg)
        return sums, counts

    sums, counts = jax.vmap(seg)(pts_s, w_s, seg_id)
    out_valid = counts > 0
    out = jnp.where(out_valid[..., None],
                    sums / jnp.maximum(counts, 1.0)[..., None], 0.0)
    from pointreggpt_tpu.core import pointops as P
    return P.keep_nearest(out, out_valid, cap, valid_is_prefix=True)


def main():
    from pointreggpt_tpu.core import pointops as P

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    # realistic occupancy: memory ~full, points in a ~3 m room shell
    mem_pts = rng.uniform(-1.6, 1.6, (BATCH, CAP, 3)).astype(np.float32)
    mem_pts[..., 2] = rng.uniform(0.5, 3.5, (BATCH, CAP))
    mem_valid = np.ones((BATCH, CAP), bool)
    new_pts = rng.uniform(-1.6, 1.6, (BATCH, NEW, 3)).astype(np.float32)
    new_pts[..., 2] = rng.uniform(0.5, 3.5, (BATCH, NEW))
    new_valid = rng.random((BATCH, NEW)) < 0.9

    mp = jnp.asarray(mem_pts)
    mv = jnp.asarray(mem_valid)
    wp = jnp.asarray(new_pts)
    wv = jnp.asarray(new_valid)

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

    # ---- baseline: the shipped memupd ------------------------------------
    @jax.jit
    def base(mp_, mv_, w_, wv_):
        merged = jnp.concatenate([mp_, w_], axis=1)
        merged_valid = jnp.concatenate([mv_, wv_], axis=1)
        down, down_valid = jax.vmap(
            lambda p, v: P.voxel_downsample(p, v, VOXEL))(
                merged, merged_valid)
        return P.keep_nearest(down, down_valid, CAP, valid_is_prefix=True)

    def run_base(i):
        out = base(mp * (1 + 0.01 * i), mv, wp * (1 + 0.01 * i), wv)
        return sync(out[0])

    t_base = timed("base   (shipped lexsort)", run_base)

    # ---- packed variants ---------------------------------------------------
    packA = jax.jit(lambda a, b, c, d: memupd_packA(a, b, c, d, VOXEL, CAP))
    packB = jax.jit(lambda a, b, c, d: memupd_packB(a, b, c, d, VOXEL, CAP))
    packB_srt = jax.jit(lambda a, b, c, d: memupd_packB(
        a, b, c, d, VOXEL, CAP, sorted_seg=True))
    packA_srt = jax.jit(lambda a, b, c, d: memupd_packA(
        a, b, c, d, VOXEL, CAP, sorted_seg=True))

    results = {}
    for name, fn in (("packA  (2-key + gathers)", packA),
                     ("packA_srt (sorted segsum)", packA_srt),
                     ("packB  (2-key carry vals)", packB),
                     ("packB_srt (sorted segsum)", packB_srt)):
        def run(i, fn=fn):
            out = fn(mp * (1 + 0.01 * i), mv, wp * (1 + 0.01 * i), wv)
            return sync(out[0])
        results[name] = timed(name, run)

    # ---- floors ------------------------------------------------------------
    n_merged = CAP + NEW
    keys0 = jnp.asarray(
        rng.integers(0, 2**30, (BATCH, n_merged)).astype(np.int32))
    keys1 = jnp.asarray(
        rng.integers(0, 2**30, (BATCH, n_merged)).astype(np.int32))

    @jax.jit
    def sort1(k):
        return lax.sort((k,), dimension=-1, num_keys=1)[0]

    @jax.jit
    def sort2(k, k2):
        return lax.sort((k, k2), dimension=-1, num_keys=2)[0]

    t_s1 = timed("floor  bare 1-key sort", lambda i: sync(sort1(keys0 + i)))
    t_s2 = timed("floor  bare 2-key sort",
                 lambda i: sync(sort2(keys0 + i, keys1 + i)))

    # ---- parity ------------------------------------------------------------
    ob = jax.tree_util.tree_map(np.asarray, base(mp, mv, wp, wv))
    for name, fn in (("packA", packA), ("packB", packB),
                     ("packB_srt", packB_srt)):
        op = jax.tree_util.tree_map(np.asarray, fn(mp, mv, wp, wv))
        nb = int(ob[1].sum())
        npk = int(op[1].sum())
        assert nb == npk, f"{name}: count mismatch {nb} vs {npk}"
        for b in range(BATCH):
            cb = ob[0][b][ob[1][b]]
            cp = op[0][b][op[1][b]]
            cb = cb[np.lexsort(cb.T)]
            cp = cp[np.lexsort(cp.T)]
            np.testing.assert_allclose(cb, cp, atol=1e-5, rtol=1e-5)
    print("parity OK (same centroid sets as base)", flush=True)

    print("\n--- summary ---", flush=True)
    print(f"base {t_base:.4f}s | " +
          " | ".join(f"{k.split()[0]} {v:.4f}s" for k, v in results.items()),
          flush=True)
    print(f"floors: 1-key {t_s1:.4f}s, 2-key {t_s2:.4f}s", flush=True)
    print("VOXEL PROBE OK", flush=True)


if __name__ == "__main__":
    main()
