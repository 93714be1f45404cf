"""XFMamba-TPU: a TPU-native JAX/Pallas framework for multi-view medical image
classification with visual state-space (VMamba / XFMamba) models.

This is a from-scratch TPU-first rebuild of the capabilities of the XFMamba
reference (MICCAI 2025, arXiv 2503.02619).  The compute path is JAX/XLA with
fused Pallas kernels for the selective-scan recurrence; multi-chip scaling is
expressed with `jax.sharding.Mesh` + jit shardings over ICI.

Subpackages
-----------
- ``ops``        : selective scan (XLA associative-scan + Pallas), cross-scan /
                   cross-merge, swap-scan fusion primitives, chunked SSD.
- ``models``     : SS2D ops, VSSM backbone, fusion blocks, multi-view tops.
- ``checkpoint`` : PyTorch ``.pth`` -> pytree converter, orbax-backed save/load.
- ``data``       : MURA / CheXpert / CBIS-DDSM / hip-X-ray two-view pipelines.
- ``train``      : jitted train/eval steps, metrics, early stopping, config.
- ``parallel``   : device-mesh construction and sharded train steps.
- ``utils``      : profiling, FLOPs accounting, saliency, misc helpers.
- ``cli``        : train + inference command-line entry points.
- ``native``     : compiled C++ host-side data-path kernels (ctypes).
"""

__version__ = "0.1.0"
