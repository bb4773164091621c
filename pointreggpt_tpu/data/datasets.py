"""Host-side dataset pipelines feeding the device (L5 of SURVEY.md §1).

Numpy/PIL reimplementations of the reference's torch Datasets with the same
on-disk contracts:

- :class:`DepthDataset` — diffusion training frames listed in
  ``dataset/3DMatch/metadata/gt.log`` (one relative depth-PNG path per line),
  plus per-scene ``camera-intrinsics.txt``. Reference: sdd:1514-1567.
- :class:`PairedDepthDataset` — depth-correction supervised pairs from
  ``metadata/{train,val}.json``. Reference: dc:910-951.
- :class:`TestDataset` — realistic depth-correction inputs built from
  3DMatch test pairs (``.pkl`` metadata + per-fragment ``.info.txt``).
  Reference: dc:954-1069.

Batches are dicts of stacked numpy arrays (the reference's collate_func,
sdd:311-322) produced by a background-thread prefetcher that overlaps PNG
decoding with device compute.

Documented divergence (deliberate): torchvision's ``ToTensor`` reads
16-bit PNGs (PIL mode ``I;16``) as **int16**, so raw values >= 32768 wrap
negative in the reference — e.g. a 65535 invalid marker becomes -1e-4 m
and dodges the ``> 1 -> 0`` clip (sdd:1552-1554, dc:934-939). We decode
uint16, so the same pixels scale to 6.5535 and the clip zeroes them like
every other out-of-range reading. 3DMatch depth frames mark invalid as 0
and stay < 10 m, so production data never reaches the wrap.
"""

from __future__ import annotations

import functools
import json
import os
import pickle
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from pointreggpt_tpu.core import imageio16
from pointreggpt_tpu.core.geometry import intrinsic_transform


def resolve_frame_record(data_root: str, folder: str, rel_path: str,
                         image_size: int, *, with_pose: bool = False):
    """Resolve a train_info/3DMatch ``.pth`` fragment record to its first
    frame: ``(depth01, intrinsic)`` or ``(depth01, pose, intrinsic)``.

    One shared implementation of the ``.pth -> .info.txt`` lookup, first-line
    parse, ``frame-%06d.depth.png`` path, and intrinsic adjustment used by
    both the Generator (sdd:2426-2459) and TestDataset (dc:990-1012), so the
    two pipelines cannot silently diverge.
    """
    info_path = os.path.join(data_root, rel_path.replace(".pth", ".info.txt"))
    with open(info_path, "r") as f:
        first = f.readlines()[0].strip()
    scene_name, seq_name, frame_start_idx, _ = first.split()
    scene_path = os.path.join(folder, scene_name)
    frame_path = os.path.join(
        scene_path, seq_name,
        "frame-{:0>6d}.depth.png".format(int(frame_start_idx)))
    image = imageio16.load_depth_model_space(frame_path, image_size)
    intrinsic = intrinsic_transform(
        np.loadtxt(os.path.join(scene_path, "camera-intrinsics.txt")),
        resize=image_size, centercrop=image_size,
    ).astype(np.float32)
    if with_pose:
        pose = np.loadtxt(frame_path.replace("depth.png", "pose.txt"))
        return image, pose, intrinsic
    return image, intrinsic


class DepthDataset:
    """Diffusion training set: single depth frames + intrinsics.

    Args:
        folder: 3DMatch-RGBD train root (scene dirs with seq subdirs).
        image_size: model resolution (256).
        gt_log: frame list file; defaults to the reference's hard-coded
            ``./dataset/3DMatch/metadata/gt.log`` (sdd:1524).
        augment_horizontal_flip: random h-flip (applied by the loader).
        seed: augmentation seed. The flip decision is a pure function of
            (seed, epoch, index) — unlike the reference's unseeded global
            RNG (RandomHorizontalFlip, sdd:1546) — so a run is bit-for-bit
            reproducible and each epoch still sees fresh flips. The epoch
            is advanced by the loader via :meth:`set_epoch`.
    """

    def __init__(self,
                 folder: str,
                 image_size: int,
                 *,
                 gt_log: str = "./dataset/3DMatch/metadata/gt.log",
                 augment_horizontal_flip: bool = False,
                 seed: int = 0):
        self.folder = folder
        self.image_size = image_size
        self.augment_horizontal_flip = augment_horizontal_flip
        self.seed = seed
        self._epoch = 0
        self.paths: List[Path] = []
        with open(gt_log, "r") as f:
            for line in f.readlines():
                line = line.strip()
                if line:
                    self.paths.append(Path(folder, line))
        self._intrinsic_cache: Dict[str, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.paths)

    def _scene_intrinsic(self, path: Path) -> np.ndarray:
        scene_path = path.parent.parent
        key = str(scene_path)
        if key not in self._intrinsic_cache:
            intrinsic = np.loadtxt(Path(scene_path, "camera-intrinsics.txt"))
            self._intrinsic_cache[key] = intrinsic_transform(
                intrinsic, resize=self.image_size,
                centercrop=self.image_size).astype(np.float32)
        return self._intrinsic_cache[key]

    def set_epoch(self, epoch: int) -> None:
        """Advance the augmentation epoch (fallback for direct ``[]``
        access; PrefetchLoader calls :meth:`getitem_at_epoch` instead so
        overlapping iterations never share mutable epoch state)."""
        self._epoch = int(epoch)

    def getitem_at_epoch(self, index: int,
                         epoch: int) -> Dict[str, np.ndarray]:
        """Fetch with an EXPLICIT epoch — the flip decision stays a pure
        function of (seed, epoch, index) even when two loader iterations
        over this dataset overlap (a shared ``_epoch`` field would race)."""
        path = self.paths[index]
        flip = self.augment_horizontal_flip and (
            np.random.default_rng(
                (self.seed, int(epoch), index)).random() < 0.5)
        img = imageio16.load_depth_model_space(path, self.image_size,
                                               flip=flip)
        return {
            "img": img[..., None],  # (h, w, 1) NHWC
            "intrinsic": self._scene_intrinsic(path),
        }

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return self.getitem_at_epoch(index, self._epoch)


class PairedDepthDataset:
    """Depth-correction pairs: {input, label, |label-input|<0.005 mask}."""

    def __init__(self, folder: str, subset: str, image_size: int):
        self.folder = folder
        self.image_size = image_size
        json_file = os.path.join(folder, f"metadata/{subset}.json")
        with open(json_file, "r") as f:
            self.metadata = list(json.load(f))

    def __len__(self) -> int:
        return len(self.metadata)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        meta = self.metadata[index]
        input_path = os.path.join(self.folder, "data", meta["input_path"])
        label_path = os.path.join(self.folder, "data", meta["label_path"])

        def load(p):
            raw = imageio16.read_depth_png(p).astype(np.float32) * 1e-4
            return np.where(raw > 1.0, 0.0, raw)

        input_img = load(input_path)
        label_img = load(label_path)
        mask = (np.abs(label_img - input_img) < 0.005).astype(np.float32)
        return {
            "input_img": input_img[..., None],
            "label_img": label_img[..., None],
            "mask": mask[..., None],
        }


@functools.lru_cache(maxsize=1)
def _reproject_jit():
    """ONE jitted reproject program shared across TestDataset items.

    An eager per-item ``reproject`` dispatches every primitive separately
    through the device tunnel (~28 ms each, the round-3 Tester finding);
    the cached jit pays one compile per image-size bucket instead."""
    import jax

    from pointreggpt_tpu.core.geometry import reproject

    return jax.jit(reproject)


class TestDataset:
    """Depth-correction test inputs from real 3DMatch test pairs.

    For each (src, tgt) fragment pair: load the first frames, compute
    relative_pose = inv(tgt_pose) @ src_pose, re-project src into the tgt
    view, mask to mutually-valid pixels. The re-projection itself runs on
    device via ``core.geometry.reproject`` at fetch time.
    Reference: dc:954-1069 (index >= len/2 swaps src/tgt).
    """

    def __init__(self, info: Dict[str, Sequence[str]], folder: str,
                 image_size: int, *, data_root: str = "./dataset/indoor/data"):
        self.info = info
        self.folder = folder
        self.image_size = image_size
        self.data_root = data_root

    def __len__(self) -> int:
        return len(self.info["src"]) + len(self.info["tgt"])

    def _frame_record(self, rel_path: str):
        return resolve_frame_record(self.data_root, self.folder, rel_path,
                                    self.image_size, with_pose=True)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        half = len(self) // 2
        if (index // half) % 2 == 0:
            src_rel = self.info["src"][index % half]
            tgt_rel = self.info["tgt"][index % half]
        else:
            src_rel = self.info["tgt"][index % half]
            tgt_rel = self.info["src"][index % half]

        src_image, src_pose, intrinsic = self._frame_record(src_rel)
        tgt_image, tgt_pose, _ = self._frame_record(tgt_rel)

        relative_pose = (np.linalg.inv(tgt_pose) @ src_pose).astype(np.float32)

        depth_rpj, mask_rpj = _reproject_jit()(
            jnp.asarray(src_image[None] * 10.0), jnp.asarray(intrinsic[None]),
            jnp.asarray(relative_pose[None]))
        input_img = np.asarray(depth_rpj)[0] * 0.1
        input_mask = np.asarray(mask_rpj)[0]

        label_img = tgt_image
        mutual = input_mask & (label_img > 0)
        input_img = np.where(mutual, input_img, 0.0).astype(np.float32)
        label_img = np.where(mutual, label_img, 0.0).astype(np.float32)
        return {
            "input_img": input_img[..., None],
            "label_img": label_img[..., None],
        }


def collate(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of example dicts into a batch dict (sdd:311-322)."""
    out: Dict[str, List[np.ndarray]] = {}
    for item in items:
        for k, v in item.items():
            out.setdefault(k, []).append(v)
    return {k: np.stack(v) for k, v in out.items()}


class PrefetchLoader:
    """Shuffling (optionally infinite) batch iterator with thread prefetch.

    Replaces the torch DataLoader + ``cycle`` combo (sdd:1639-1647):
    worker threads decode PNGs while the device trains on the previous batch.
    """

    def __init__(self,
                 dataset,
                 batch_size: int,
                 *,
                 shuffle: bool = True,
                 drop_last: bool = True,
                 infinite: bool = False,
                 num_workers: Optional[int] = None,
                 prefetch: int = 2,
                 seed: int = 0,
                 start_epoch: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.infinite = infinite
        # workers default to the host core count like the reference's
        # DataLoader(num_workers=cpu_count()) (sdd:1639-1644, dc:1132) —
        # PNG decode is the host hot path and must feed the device step;
        # the policy lives HERE so every consumer gets it
        if not num_workers:
            num_workers = os.cpu_count() or 1
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        # advances across __iter__ calls so a finite loader reshuffles
        # every epoch like torch DataLoader(shuffle=True) — a fresh
        # permutation per pass, still a pure function of (seed, epoch).
        # start_epoch lets a resumed trainer fast-forward the stream to
        # the epoch its restored step had reached instead of replaying
        # epoch 0's order
        self._epoch = int(start_epoch)
        if drop_last and len(dataset) < batch_size:
            raise ValueError(
                f"dataset has {len(dataset)} examples < batch_size "
                f"{batch_size} with drop_last=True: no batch can be formed")

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n //
                                                             self.batch_size)

    def _index_batches(self, start_epoch: int):
        """Yield (epoch, index_batch) pairs; the epoch rides alongside the
        indices so the producer can fetch at an explicit epoch instead of
        mutating shared dataset state (two overlapping iterations would
        race on a ``set_epoch`` field)."""
        epoch = start_epoch
        while True:
            # legacy fallback: datasets without getitem_at_epoch still
            # learn the epoch here, before any of its batches decode
            if not hasattr(self.dataset, "getitem_at_epoch"):
                set_epoch = getattr(self.dataset, "set_epoch", None)
                if set_epoch is not None:
                    set_epoch(epoch)
            rng = np.random.default_rng([self.seed, epoch])
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(idx)
            stop = (len(idx) // self.batch_size *
                    self.batch_size if self.drop_last else len(idx))
            for s in range(0, stop, self.batch_size):
                yield epoch, list(idx[s:s + self.batch_size])
            epoch += 1
            if not self.infinite:
                return

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor

        # snapshot + advance the epoch on the CONSUMER side, before the
        # producer thread starts: each __iter__ call owns exactly one epoch
        # number, so a partially-consumed or abandoned finite iterator still
        # leaves the next __iter__ a deterministic fresh permutation, and
        # two overlapping __iter__ calls cannot race on the counter. (An
        # infinite iterator advances a LOCAL counter per pass instead; the
        # shared counter only seeds its first epoch.)
        start_epoch = self._epoch
        self._epoch = start_epoch + 1

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []
        # set by the consumer's finally (normal exhaustion, an exception,
        # or GeneratorExit when the iterator is abandoned/GC'd): unblocks a
        # producer stuck on a full queue so an abandoned iterator cannot
        # leak its thread + ~prefetch decoded batches + the worker pool
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        fetch_at = getattr(self.dataset, "getitem_at_epoch", None)

        def producer():
            # item decodes fan out over a thread pool (PNG decode is the
            # host hot path; PIL/zlib release the GIL)
            try:
                if self.num_workers > 1:
                    with ThreadPoolExecutor(self.num_workers) as pool:
                        for epoch, batch_idx in self._index_batches(
                                start_epoch):
                            if fetch_at is not None:
                                items = list(
                                    pool.map(fetch_at, batch_idx,
                                             [epoch] * len(batch_idx)))
                            else:
                                items = list(pool.map(
                                    self.dataset.__getitem__, batch_idx))
                            if not put(collate(items)):
                                return
                else:
                    for epoch, batch_idx in self._index_batches(start_epoch):
                        if fetch_at is not None:
                            items = [fetch_at(i, epoch) for i in batch_idx]
                        else:
                            items = [self.dataset[i] for i in batch_idx]
                        if not put(collate(items)):
                            return
            except BaseException as e:  # noqa: BLE001 - re-raised below
                # surface decode failures in the CONSUMER (like torch
                # DataLoader workers): swallowing them here would end a
                # finite pass early on a truncated dataset, or turn an
                # IOError into a bare StopIteration in the train loop
                error.append(e)
            finally:
                # the sentinel must use the same stoppable blocking put: the
                # queue may be full on normal completion (put_nowait would
                # drop it and strand the consumer on q.get() forever); if
                # the consumer is already gone, stop is set and put returns
                put(sentinel)

        t = threading.Thread(target=producer, daemon=True,
                             name="prgpt-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()
