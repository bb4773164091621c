"""Load the ACTUAL reference modules from /root/reference for parity tests.

The reference files import a handful of packages absent from this
environment (open3d, ema_pytorch, pytorch_fid, coloredlogs, torchvision);
none of them are touched by the model/geometry/diffusion code paths the
parity tests exercise, so lightweight ``sys.modules`` stubs are installed
for the duration of the import and removed afterwards (so other tests see
the true import errors).

This retires the hand-built torch mirror in test_torch_parity.py as the
*sole* oracle: tests built on this loader run the reference's own
``Unet``/``MaskUnet``/``GaussianDiffusion``/geometry code
(successive_ddnm_diffusion.py, depth_correction.py) verbatim.
"""

import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"

_STUB_NAMES = [
    "open3d",
    "coloredlogs",
    "ema_pytorch",
    "pytorch_fid",
    "pytorch_fid.inception",
    "pytorch_fid.fid_score",
    "torchvision",
    "torchvision.transforms",
    "torchvision.utils",
]

_cache = {}


def _build_stubs():
    stubs = {}
    for name in _STUB_NAMES:
        mod = types.ModuleType(name)
        mod.__stub__ = True
        stubs[name] = mod

    class _EMA:  # constructed lazily by Trainer only; never in parity paths
        def __init__(self, *a, **k):
            raise NotImplementedError("ema_pytorch stub")

    class _InceptionV3:
        def __init__(self, *a, **k):
            raise NotImplementedError("pytorch_fid stub")

    stubs["ema_pytorch"].EMA = _EMA
    stubs["pytorch_fid"].inception = stubs["pytorch_fid.inception"]
    stubs["pytorch_fid"].fid_score = stubs["pytorch_fid.fid_score"]
    stubs["pytorch_fid.inception"].InceptionV3 = _InceptionV3
    stubs["pytorch_fid.fid_score"].calculate_frechet_distance = (
        lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("pytorch_fid stub")))
    stubs["torchvision"].transforms = stubs["torchvision.transforms"]
    stubs["torchvision"].utils = stubs["torchvision.utils"]
    stubs["coloredlogs"].install = lambda *a, **k: None
    return stubs


def _load_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception:
        del sys.modules[name]
        raise
    return mod


def load_reference():
    """Import and return (sdd, dc): the two real reference modules.

    sdd = denoising_diffusion_pytorch/successive_ddnm_diffusion.py
    dc  = depth_correction_pytorch/depth_correction.py
    """
    if "modules" in _cache:
        return _cache["modules"]

    installed = []
    stubs = _build_stubs()
    for name, mod in stubs.items():
        if name not in sys.modules:
            sys.modules[name] = mod
            installed.append(name)
    try:
        sdd = _load_file(
            "_ref_successive_ddnm_diffusion",
            f"{REFERENCE_ROOT}/denoising_diffusion_pytorch/"
            "successive_ddnm_diffusion.py")
        dc = _load_file(
            "_ref_depth_correction",
            f"{REFERENCE_ROOT}/depth_correction_pytorch/depth_correction.py")
    finally:
        # the loaded modules keep direct references to the stub objects they
        # imported; removing the sys.modules entries restores honest
        # ImportErrors for everything else in the suite.
        for name in installed:
            del sys.modules[name]

    _cache["modules"] = (sdd, dc)
    return _cache["modules"]
