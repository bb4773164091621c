"""Ledger probe: split the full generation step into chain vs extras.

VERDICT r3 optional #9: the U-Net chain's ceiling is closed
(tools/profile_gemm_floor.py); the non-U-Net remainder of the generation
step — MaskUNet x2, splat, back-projection, voxel memory update — never
got its own written floor. This measures, at the production config
(batch 8, 256^2, 250-step chain, memory 1<<18):

  T_full    one full Generator step program (what production runs)
  T_chain   the bare 250-step DDIM+DDNM chain on a fixed condition
  T_extras  the step program with the chain replaced by a passthrough
            (everything else identical, fused the same way)
  component programs: MaskUNet x2, splat(+pose), memory update
            (concat -> voxel_downsample -> keep_nearest), back-projection

plus a floor for the dominant extra: the memory update is sort-bound, so
its floor is the bare lexsort on the same (8, 327680) key set — the sort
IS the algorithm; anything else in the update is elementwise.

Timing discipline per CLAUDE.md: every rep varies its inputs by >=1%
(the tunnel memoizes identical calls), syncs are forced value transfers
(block_until_ready is not a sync through the tunnel), and per-program
times come from chained jitted scans where cheap enough, else min-of-3.
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


def main():
    from pointreggpt_tpu.core import geometry as G
    from pointreggpt_tpu.core import pointops as P
    from pointreggpt_tpu.core import sampling as S
    from pointreggpt_tpu.diffusion import GaussianDiffusion
    from pointreggpt_tpu.generate.generator import Generator
    from pointreggpt_tpu.models import DiffusionUNet, MaskUNet, maybe_bake

    batch, H, cap = 8, 256, 1 << 18
    model = DiffusionUNet(dim=64, param_cond_dim=4, dim_mults=(1, 2, 4, 8),
                          channels=1, dtype=jnp.bfloat16)
    dc_model = MaskUNet(dim=64, dim_mults=(1, 2, 4, 8), dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(
        apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
        image_size=H, timesteps=1000, sampling_timesteps=250,
        loss_type="l1", objective="pred_x0", beta_schedule="sigmoid",
        ddim_sampling_eta=1.0, is_ddnm_sampling=True)

    params = jax.device_put(maybe_bake(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, H, 1)),
                   jnp.zeros((1,)), jnp.zeros((1, 4))), model.dtype))
    dc_params = jax.device_put(maybe_bake(
        dc_model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, H, 1))),
        dc_model.dtype))

    gen = Generator(model, diffusion, folder=".", batch_size=batch,
                    memory_capacity=cap, depth_correction_model=dc_model)
    step_fn = gen._step_fns.setdefault(
        (False, 0.002), gen._build_step_fn(False, 0.002))

    rng = np.random.default_rng(0)
    depth = rng.uniform(1.0, 3.4, (batch, H, H)).astype(np.float32)
    intr = np.tile(
        np.array([[[312.0, 0, 128.0], [0, 312.0, 128.0], [0, 0, 1]]],
                 np.float32), (batch, 1, 1))
    intr_j = jnp.asarray(intr)
    pts, valid = G.depth_to_points(jnp.asarray(depth), intr_j,
                                   clip=(0.5, 10.0))
    pad = cap - pts.shape[1]
    mem_pts = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)))
    mem_valid = jnp.pad(valid, ((0, 0), (0, pad)))
    param_cond = G.param_vector(intr_j)

    def sync(x):
        return float(np.asarray(jnp.sum(
            x if x.dtype != jnp.bool_ else x.astype(jnp.float32))))

    def timed(label, fn, n=3):
        """min-of-n with varied inputs; first (compile) call excluded."""
        fn(0)
        ts = []
        for i in range(1, n + 1):
            t0 = time.time()
            fn(i)
            ts.append(time.time() - t0)
        print(f"{label}: {['%.3f' % t for t in ts]} min {min(ts):.3f}s",
              flush=True)
        return min(ts)

    # ---- T_full: one full production step --------------------------------
    def run_full(i):
        out = step_fn(params, dc_params, mem_pts, mem_valid, intr_j,
                      param_cond, jax.random.PRNGKey(100 + i))
        return sync(out[3])

    t_full = timed("T_full  (full step)", run_full)

    # ---- T_chain: the bare 250-step chain --------------------------------
    img_cond0 = G.normalize_to_neg_one_to_one(
        jnp.stack([depth * 0.1, (depth > 0).astype(jnp.float32)], axis=-1))

    @jax.jit
    def chain(p, key, pc, ic):
        return diffusion.sample(p, key, param_cond=pc, img_cond=ic,
                                has_refine_step=False)

    def run_chain(i):
        return sync(chain(params, jax.random.PRNGKey(200 + i), param_cond,
                          img_cond0))

    t_chain = timed("T_chain (bare DDIM+DDNM)", run_chain)

    # ---- T_extras: the step with the chain replaced by a passthrough -----
    def step_noch(ema_params, dc_params_, mem_pts_, mem_valid_, intrinsic,
                  pc, key):
        k_pose, k_sample = jax.random.split(key)
        b = mem_pts_.shape[0]
        pose = S.random_sample_pose(k_pose, b)
        pts_ = G.transform_points(mem_pts_, pose)
        depth_rpj, mask_rpj = G.points_to_depth(pts_, mem_valid_, intrinsic,
                                                image_size=(H, H))
        images_raw = depth_rpj * 0.1
        images_rpj = images_raw
        prob = dc_model.apply(dc_params_, images_rpj[..., None])
        keep = prob[..., 0] > 0.99
        images_rpj = jnp.where(keep, images_rpj, 0.0)
        mask_rpj = mask_rpj & keep
        img_cond = G.normalize_to_neg_one_to_one(
            jnp.stack([images_rpj, mask_rpj.astype(jnp.float32)], axis=-1))
        # chain passthrough: keep img_cond live so nothing above is DCEd
        images = G.unnormalize_to_zero_to_one(img_cond[..., :1]) \
            + 1e-6 * jax.random.normal(k_sample, (b, H, H, 1))
        prob2 = dc_model.apply(dc_params_, images)
        images = jnp.where(prob2 > 0.99, images, 0.0)
        new_pts, new_valid = G.depth_to_points(
            images[..., 0] * 10.0, intrinsic, clip=(0.5, 10.0))
        rot = pose[:, :3, :3]
        t = pose[:, :3, 3]
        world = jnp.einsum("bji,bnj->bni", rot, new_pts - t[:, None, :],
                           precision=jax.lax.Precision.HIGHEST)
        merged = jnp.concatenate([mem_pts_, world], axis=1)
        merged_valid = jnp.concatenate([mem_valid_, new_valid], axis=1)
        down, down_valid = jax.vmap(
            lambda p, v: P.voxel_downsample(p, v, 0.002))(
                merged, merged_valid)
        return P.keep_nearest(down, down_valid, cap, valid_is_prefix=True)

    step_noch_j = jax.jit(step_noch)

    def run_noch(i):
        out = step_noch_j(params, dc_params, mem_pts, mem_valid, intr_j,
                          param_cond, jax.random.PRNGKey(300 + i))
        return sync(out[0])

    t_extras = timed("T_extras (step minus chain)", run_noch)

    # ---- components -------------------------------------------------------
    @jax.jit
    def dc2(p, x, x2):
        return dc_model.apply(p, x), dc_model.apply(p, x2)

    def run_dc(i):
        a, b_ = dc2(dc_params,
                    jnp.asarray(depth[..., None] * (0.1 + 0.001 * i)),
                    jnp.asarray(depth[..., None] * (0.05 + 0.001 * i)))
        return sync(a) + sync(b_)

    t_dc = timed("MaskUNet x2", run_dc)

    @jax.jit
    def splat(mp, mv, ic, key):
        pose = S.random_sample_pose(key, mp.shape[0])
        pts_ = G.transform_points(mp, pose)
        d, m = G.points_to_depth(pts_, mv, ic, image_size=(H, H))
        return d, m

    def run_splat(i):
        d, m = splat(mem_pts * (1 + 0.01 * i), mem_valid, intr_j,
                     jax.random.PRNGKey(400 + i))
        return sync(d)

    t_splat = timed("pose+transform+splat", run_splat)

    @jax.jit
    def memupd(mp, mv, w, wv):
        merged = jnp.concatenate([mp, w], axis=1)
        merged_valid = jnp.concatenate([mv, wv], axis=1)
        down, down_valid = jax.vmap(
            lambda p, v: P.voxel_downsample(p, v, 0.002))(
                merged, merged_valid)
        return P.keep_nearest(down, down_valid, cap, valid_is_prefix=True)

    world0 = pts + 0.01

    def run_memupd(i):
        out = memupd(mem_pts * (1 + 0.01 * i), mem_valid,
                     world0 * (1 + 0.01 * i), valid)
        return sync(out[0])

    t_mem = timed("memory update (voxel+keep)", run_memupd)

    # floor for the memory update: the bare multi-key sort on the same
    # (8, 327680) merged key set — voxel_downsample is quantize -> lexsort
    # -> segment-mean; the sort is the algorithm, the rest is elementwise.
    n_merged = cap + pts.shape[1]

    @jax.jit
    def bare_sort(keys):
        return jax.vmap(lambda k: jnp.sort(k))(keys)

    keys0 = jnp.asarray(
        rng.integers(0, 2**31, (batch, n_merged)).astype(np.int32))

    def run_sort(i):
        return sync(bare_sort(keys0 + i))

    t_sort = timed(f"bare int32 sort (8x{n_merged})", run_sort)

    print("\n--- split ---", flush=True)
    print(f"T_full {t_full:.3f}s = T_chain {t_chain:.3f}s "
          f"+ extras {t_full - t_chain:.3f}s "
          f"({100 * (t_full - t_chain) / t_full:.1f}% of the step)",
          flush=True)
    print(f"T_extras program alone: {t_extras:.3f}s "
          f"(dc x2 {t_dc:.3f} + splat {t_splat:.3f} + mem {t_mem:.3f})",
          flush=True)
    print(f"memory-update floor (one bare sort): {t_sort:.3f}s vs measured "
          f"{t_mem:.3f}s", flush=True)
    ppm_now = batch * 60.0 / t_full
    ppm_zero_extras = batch * 60.0 / t_chain
    print(f"pairs/min now {ppm_now:.1f}; with ZERO-cost extras "
          f"{ppm_zero_extras:.1f} (max headroom "
          f"{ppm_zero_extras - ppm_now:.1f})", flush=True)
    print("SPLIT PROBE OK", flush=True)


if __name__ == "__main__":
    main()
