"""TPU drive: depth-correction MaskTrainer epoch loop on the real chip."""
import sys, time, tempfile, os, json
from pathlib import Path
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/pointreggpt_xla")
import jax.numpy as jnp
import numpy as np
import cv2

from pointreggpt_tpu.models import MaskUNet
from pointreggpt_tpu.train import MaskTrainer

print(f"backend={jax.default_backend()}")
tmp = Path(tempfile.mkdtemp(prefix="drive_mask_"))
os.chdir(tmp)

# synthetic paired depth-correction tree (metadata/{train,val}.json)
meta = tmp / "dc/metadata"; meta.mkdir(parents=True)
data = tmp / "dc/data"; data.mkdir(parents=True)
rng = np.random.default_rng(0)
names = []
for i in range(16):
    label = rng.integers(5000, 30000, (256, 256)).astype(np.uint16)
    inp = label.copy()
    bad = rng.random((256, 256)) < 0.1
    inp[bad] = (inp[bad] * 0.7).astype(np.uint16)  # penetration artifacts
    cv2.imwrite(str(data / f"{i:06d}-input.depth.png"), inp)
    cv2.imwrite(str(data / f"{i:06d}-label.depth.png"), label)
    names.append({"input_path": f"{i:06d}-input.depth.png", "label_path": f"{i:06d}-label.depth.png"})
(meta / "train.json").write_text(json.dumps(names[:12]))
(meta / "val.json").write_text(json.dumps(names[12:]))

model = MaskUNet(dim=64, dim_mults=(1, 2, 4, 8), dtype=jnp.bfloat16)
trainer = MaskTrainer(
    model, str(tmp / "dc"), train_batch_size=4, train_lr=4e-5,
    epochs=2, results_folder=str(tmp / "results"), num_workers=1,
    image_size=256)
t0 = time.time()
trainer.train_and_eval()
print(f"2 epochs (12 train / 4 val @256^2, incl. compile): {time.time()-t0:.1f}s")
assert (tmp / "results/model-best.ckpt").exists()
assert (tmp / "results/model-latest.ckpt").exists()
print("MASKTRAINER TPU DRIVE OK")

# --- MaskTester qualitative path (dc:1398-1522) on the same checkpoint ---
sys.path.insert(0, "/root/repo/tests")
from test_generate import make_3dmatch_tree

from pointreggpt_tpu.train import MaskTester
import pointreggpt_tpu.train.mask_trainer as mt

folder, info = make_3dmatch_tree(tmp, n_scenes=2)
orig_ds = mt.TestDataset
mt.TestDataset = lambda info_, folder_, image_size, **kw: orig_ds(
    info_, folder_, image_size,
    data_root=str(tmp / "dataset/indoor/data"))
tester = MaskTester(model, folder, info=info, image_size=256,
                    results_folder=str(tmp / "results"),
                    samples_folder=str(tmp / "mask_samples"))
tester.load("best")
t0 = time.time()
tester.test(limit=2)
print(f"MaskTester 2 items @256^2 (GIFs): {time.time()-t0:.1f}s")
for idx in range(2):
    assert (tmp / f"mask_samples/{idx:06d}-input.gif").exists()
    assert (tmp / f"mask_samples/{idx:06d}-output.gif").exists()
print("MASKTESTER TPU DRIVE OK")
