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

BATCH = int(os.environ.get("PRGPT_PROBE_BATCH", 8))
CAP = int(os.environ.get("PRGPT_PROBE_CAP", 1 << 18))
NEW = int(os.environ.get("PRGPT_PROBE_NEW", 65536))
VOXEL = float(os.environ.get("PRGPT_PROBE_VOXEL", 0.002))
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


def memupd_packC(mp, mv, w, wv, voxel, cap, *, keep=True):
    """packB minus the validity operand: invalid points carry sentinel keys,
    so post-sort validity is just ``hi_s != SENTINEL`` — the sort moves one
    fewer f32 column. segment ids use sorted indices."""
    pts = jnp.concatenate([mp, w], axis=1)
    val = jnp.concatenate([mv, wv], axis=1)
    b, n, _ = pts.shape
    hi, lo = _quantize(pts, val, voxel)
    hi_s, lo_s, x_s, y_s, z_s = lax.sort(
        (hi, lo, pts[..., 0], pts[..., 1], pts[..., 2]),
        dimension=-1, num_keys=2)
    val_s = hi_s != _INT_SENTINEL
    seg_id = _segments(hi_s, lo_s)
    pts_s = jnp.stack([x_s, y_s, z_s], axis=-1)
    wgt = val_s.astype(pts.dtype)

    def seg(p, wt, sid):
        sums = jax.ops.segment_sum(p * wt[:, None], sid, num_segments=n,
                                   indices_are_sorted=True)
        counts = jax.ops.segment_sum(wt, sid, num_segments=n,
                                     indices_are_sorted=True)
        return sums, counts

    sums, counts = jax.vmap(seg)(pts_s, wgt, seg_id)
    out_valid = counts > 0
    out = jnp.where(out_valid[..., None],
                    sums / jnp.maximum(counts, 1.0)[..., None], 0.0)
    if not keep:
        return out, out_valid
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


def memupd_scanfuse(mp, mv, w, wv, voxel, cap):
    """Scatter-free: packed 2-key sort -> segmented-scan segment sums
    (log-depth adds, no scatter) -> ONE d2-keyed sort that packs valid
    centroids AND does keep_nearest's capacity selection as a slice."""
    pts = jnp.concatenate([mp, w], axis=1)
    val = jnp.concatenate([mv, wv], axis=1)
    b, n, _ = pts.shape
    hi, lo = _quantize(pts, val, voxel)
    hi_s, lo_s, x_s, y_s, z_s = lax.sort(
        (hi, lo, pts[..., 0], pts[..., 1], pts[..., 2]),
        dimension=-1, num_keys=2)
    pts_s = jnp.stack([x_s, y_s, z_s], axis=-1)
    val_s = hi_s != _INT_SENTINEL
    is_first = ((hi_s != jnp.roll(hi_s, 1, axis=-1)) |
                (lo_s != jnp.roll(lo_s, 1, axis=-1)))
    is_first = is_first.at[:, 0].set(True)
    is_last = jnp.roll(is_first, -1, axis=-1).at[:, -1].set(True)

    wgt = val_s.astype(pts.dtype)

    def combine(a, c):
        fa, pa, wa = a
        fc, pc, wc = c
        return (fa | fc,
                jnp.where(fc[..., None], pc, pa + pc),
                jnp.where(fc, wc, wa + wc))

    _, psum, wsum = lax.associative_scan(
        combine, (is_first, pts_s * wgt[..., None], wgt), axis=1)

    seg_ok = is_last & (wsum > 0)
    centroid = psum / jnp.maximum(wsum, 1.0)[..., None]
    d2 = jnp.sum(centroid * centroid, axis=-1)
    key = jnp.where(seg_ok, d2, jnp.inf)
    key_s, cx, cy, cz = lax.sort(
        (key, centroid[..., 0], centroid[..., 1], centroid[..., 2]),
        dimension=-1, num_keys=1, is_stable=True)
    out = jnp.stack([cx[:, :cap], cy[:, :cap], cz[:, :cap]], axis=-1)
    out_valid = jnp.isfinite(key_s[:, :cap])
    out = jnp.where(out_valid[..., None], out, 0.0)
    nseg = jnp.sum(seg_ok.astype(jnp.int32), axis=-1)
    overflow = jnp.maximum(nseg - cap, 0)
    return out, out_valid, overflow


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

    packC = jax.jit(lambda a, b, c, d: memupd_packC(a, b, c, d, VOXEL, CAP))
    packC_nk = jax.jit(lambda a, b, c, d: memupd_packC(
        a, b, c, d, VOXEL, CAP, keep=False))

    scanfuse = jax.jit(
        lambda a, b, c, d: memupd_scanfuse(a, b, c, d, VOXEL, CAP))
    shipped = jax.jit(lambda a, b, c, d: P.memory_voxel_update(
        a, b, c, d, VOXEL, CAP))

    for name, fn in (("packC  (2-key, no w op)", packC),
                     ("packC_nokeep (no keep_nearest)", packC_nk),
                     ("scanfuse (segscan + d2 sort)", scanfuse),
                     ("shipped (memory_voxel_update)", shipped)):
        def run(i, fn=fn):
            out = fn(mp * (1 + 0.01 * i), mv, wp * (1 + 0.01 * i), wv)
            return sync(out[0])
        results[name] = timed(name, run)

    # ---- sub-parts (where does packC's time go?) ---------------------------
    @jax.jit
    def part_sort(mp_, mv_, w_, wv_):
        pts = jnp.concatenate([mp_, w_], axis=1)
        val = jnp.concatenate([mv_, wv_], axis=1)
        hi, lo = _quantize(pts, val, VOXEL)
        return lax.sort((hi, lo, pts[..., 0], pts[..., 1], pts[..., 2]),
                        dimension=-1, num_keys=2)

    sorted_ops = jax.tree_util.tree_map(jnp.asarray, part_sort(mp, mv, wp, wv))

    @jax.jit
    def part_segsum(hi_s, lo_s, x_s, y_s, z_s):
        b, n = hi_s.shape
        seg_id = _segments(hi_s, lo_s)
        pts_s = jnp.stack([x_s, y_s, z_s], axis=-1)
        wgt = (hi_s != _INT_SENTINEL).astype(pts_s.dtype)

        def seg(p, wt, sid):
            sums = jax.ops.segment_sum(p * wt[:, None], sid, num_segments=n,
                                       indices_are_sorted=True)
            counts = jax.ops.segment_sum(wt, sid, num_segments=n,
                                         indices_are_sorted=True)
            return sums, counts

        sums, counts = jax.vmap(seg)(pts_s, wgt, seg_id)
        out_valid = counts > 0
        out = jnp.where(out_valid[..., None],
                        sums / jnp.maximum(counts, 1.0)[..., None], 0.0)
        return out, out_valid

    seg_out = part_segsum(*sorted_ops)
    seg_out = jax.tree_util.tree_map(jnp.asarray, seg_out)

    @jax.jit
    def part_keep(out, out_valid):
        from pointreggpt_tpu.core import pointops as P
        return P.keep_nearest(out, out_valid, CAP, valid_is_prefix=True)

    def run_psort(i):
        return sync(part_sort(mp * (1 + 0.01 * i), mv,
                              wp * (1 + 0.01 * i), wv)[2])

    def run_pseg(i):
        return sync(part_segsum(sorted_ops[0] + i, sorted_ops[1],
                                sorted_ops[2] * (1 + 0.01 * i),
                                sorted_ops[3], sorted_ops[4])[0])

    def run_pkeep(i):
        return sync(part_keep(seg_out[0] * (1 + 0.01 * i), seg_out[1])[0])

    t_psort = timed("part   sort (2key+3f32)", run_psort)
    t_pseg = timed("part   segsum+centroid", run_pseg)
    t_pkeep = timed("part   keep_nearest", run_pkeep)
    print(f"parts sum {t_psort + t_pseg + t_pkeep:.4f}s", flush=True)

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
                     ("packB_srt", packB_srt), ("packC", packC),
                     ("scanfuse", scanfuse), ("shipped", shipped)):
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
