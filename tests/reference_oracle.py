"""Import helper for the read-only PyTorch reference at /root/reference.

The reference is used purely as a *numerical oracle* in parity tests (the
"fast kernel vs slow reference oracle" pattern, SURVEY.md §4).  It needs
``timm`` and ``fvcore`` which are not installed, so we install minimal shims
(eval-mode DropPath identity, trunc_normal_, no-op FLOPs counters) before
importing.  Tests must call every reference module in eval mode only.
"""

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_shims():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    # Import torch's dynamo/inductor stack BEFORE the triton shim exists:
    # their module bodies probe `import triton` (has_triton_package) and
    # then unconditionally `import triton.backends.compiler` etc., which
    # the shim cannot satisfy.  With no "triton" in sys.modules yet they
    # resolve to the clean no-triton path once, and the optimizer-step /
    # backward machinery (used by the trajectory-parity test) never
    # touches the shim.
    try:
        import torch._dynamo  # noqa: F401
        import torch._inductor.runtime.hints  # noqa: F401
    except Exception:
        pass

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            # eval-mode identity; tests never exercise training-mode droppath
            return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = trunc_normal_
    timm_models.layers = timm_layers
    timm.models = timm_models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

    # triton shim: csm_triton.py decorates kernels with @triton.jit at module
    # level even in the fallback path; the kernels are never *called* on CPU
    # (cross_scan_fn dispatches to torch for non-CUDA tensors).
    class _TLModule(types.ModuleType):
        def __getattr__(self, name):
            return object

    triton = types.ModuleType("triton")
    tl = _TLModule("triton.language")
    triton.jit = lambda fn=None, **kw: (fn if fn is not None
                                        else (lambda f: f))
    triton.language = tl
    triton.cdiv = lambda a, b: -(-a // b)
    triton.__version__ = "2.2.0"
    triton.Config = lambda *a, **k: None
    triton.autotune = lambda *a, **k: (lambda f: f)
    triton.heuristics = lambda *a, **k: (lambda f: f)
    triton.next_power_of_2 = lambda n: 1 << (int(n) - 1).bit_length()
    testing = types.ModuleType("triton.testing")
    testing.do_bench = lambda *a, **k: 0.0
    triton.testing = testing
    sys.modules.setdefault("triton", triton)
    sys.modules.setdefault("triton.language", tl)
    sys.modules.setdefault("triton.testing", testing)

    # newer CPU-only torch raises on `with torch.cuda.device(cpu_device)`
    # (used unconditionally at csm_triton.py:505,:515); make it a no-op.
    class _CudaDeviceNoop:
        def __init__(self, device):
            self.device = device

        def __enter__(self):
            return None

        def __exit__(self, *a):
            return False

    torch.cuda.device = _CudaDeviceNoop

    torchvision = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    torchvision.models = tv_models
    sys.modules.setdefault("torchvision", torchvision)
    sys.modules.setdefault("torchvision.models", tv_models)
    torchinfo = types.ModuleType("torchinfo")
    torchinfo.summary = lambda *a, **k: None
    sys.modules.setdefault("torchinfo", torchinfo)

    fvcore = types.ModuleType("fvcore")
    fvcore_nn = types.ModuleType("fvcore.nn")
    fvcore_nn.FlopCountAnalysis = object
    fvcore_nn.flop_count_str = lambda *a, **k: ""
    fvcore_nn.flop_count = lambda *a, **k: ({}, {})
    fvcore_nn.parameter_count = lambda *a, **k: {"": 0}
    fvcore.nn = fvcore_nn
    sys.modules["fvcore"] = fvcore
    sys.modules["fvcore.nn"] = fvcore_nn


def reference_available():
    return os.path.isdir(REFERENCE_ROOT)


def load_reference_module(name):
    """Import a module from the reference tree, e.g. 'models.vmamba'."""
    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    for sub in ("models", "models/mamba2", "libs"):
        d = os.path.join(REFERENCE_ROOT, sub)
        if d not in sys.path:
            sys.path.insert(0, d)
    import importlib
    return importlib.import_module(name)
