"""pointreggpt_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of PointRegGPT.

PointRegGPT (ECCV 2024) is a generative training-data pipeline for indoor 3D
point-cloud registration: a depth-inpainting diffusion model with DDNM
null-space guided sampling plus a depth-correction U-Net, driven by a
geometric engine (depth back-projection, random SE(3) camera motion, z-buffer
re-projection). This package re-designs every component TPU-first:

- ``core``      geometry / point ops as static-shape JAX functions
- ``ops``       Pallas TPU kernels for the hot primitives (+ XLA fallbacks)
- ``models``    Flax U-Nets (diffusion denoiser + depth-correction mask net)
- ``diffusion`` schedule tables, losses, and the jitted lax.scan DDIM/DDNM
                sampling chain
- ``parallel``  device-mesh / sharding helpers (data parallel over ICI)
- ``train``     trainers (diffusion + mask), EMA, checkpointing, metrics
- ``data``      host-side dataset pipelines feeding the device
- ``generate``  the dataset factory (Generator, Tester, gt.log overlap)
- ``dataloaders`` downstream mixture datasets (Predator/CoFiNet/GeoTrans)
- ``eval``      FID and qualitative eval helpers
- ``native``    ctypes bindings to the C++ host runtime (native/)

Reference implementation surveyed in /root/repo/SURVEY.md; all ``Reference:``
docstring citations point into the upstream PyTorch repo layout
(denoising_diffusion_pytorch/successive_ddnm_diffusion.py = "sdd",
depth_correction_pytorch/depth_correction.py = "dc"). PARITY.md maps the
full component inventory.
"""

__version__ = "0.1.0"

# Public API re-exports (lazy-friendly: these imports are lightweight;
# heavy deps like flax load on first model construction).
from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.models import DiffusionUNet, MaskUNet

__all__ = ["DiffusionUNet", "MaskUNet", "GaussianDiffusion", "__version__"]
