"""Saliency / Grad-CAM for the two-view models.

Reference counterpart: pytorch_grad_cam wired through ``ModelWrapper``
(`/root/reference/2_inference_mura.py:109-121`, `net_fusionmamba.py:10-26`),
targeting the backbone's stage-3 feature maps.

JAX-native design: the model exposes its stage-3 features through two flax
mechanisms — ``sow`` (values, via ``capture_intermediates``-style collection
requests) and ``perturb`` (gradients: the gradient w.r.t. the zero-valued
perturbation variable equals the gradient w.r.t. the intermediate).  Grad-CAM
is then ``ReLU(Σ_c w_c · F_c)`` with ``w_c = GAP(∂score/∂F_c)``, upsampled to
the input size — identical math to pytorch_grad_cam's GradCAM class.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _cam_from(features, grads, out_hw: Optional[Tuple[int, int]] = None):
    """features/grads: (B, h, w, C) -> normalized CAM (B, H, W)."""
    weights = grads.mean(axis=(1, 2), keepdims=True)          # (B,1,1,C)
    cam = jnp.maximum((weights * features).sum(axis=-1), 0.0)  # (B,h,w)
    if out_hw is not None:
        cam = jax.image.resize(cam, (cam.shape[0],) + tuple(out_hw),
                               method="bilinear")
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    return (cam - lo) / jnp.maximum(hi - lo, 1e-8)


def grad_cam_two_view(model, variables, x1, x2, class_idx: int,
                      upsample_to_input: bool = True):
    """Grad-CAM heatmaps for both views of a two-view model whose forward
    defines the ``stage3_a``/``stage3_b`` perturb+sow hooks
    (``TwoViewXFMamba``).

    Returns (cam_a, cam_b), each (B, H, W) in [0, 1].
    """
    variables = {k: v for k, v in variables.items()
                 if k not in ("perturbations", "intermediates")}
    _, vars0 = model.apply(
        variables, x1, x2, mutable=["perturbations", "intermediates"])
    perts = jax.tree_util.tree_map(jnp.zeros_like, vars0["perturbations"])

    def score(p):
        logits, inter = model.apply(
            {**variables, "perturbations": p}, x1, x2,
            mutable=["intermediates"])
        feats = (inter["intermediates"]["stage3_a"][0],
                 inter["intermediates"]["stage3_b"][0])
        return logits[:, class_idx].sum(), feats

    grads, (f_a, f_b) = jax.grad(score, has_aux=True)(perts)
    g_a = grads["stage3_a"]
    g_b = grads["stage3_b"]
    out_hw = x1.shape[1:3] if upsample_to_input else None
    return _cam_from(f_a, g_a, out_hw), _cam_from(f_b, g_b, out_hw)


def input_saliency(apply_fn: Callable, x1, x2, class_idx: int):
    """Vanilla input-gradient saliency |∂logit_c/∂x| per view (B, H, W)."""
    def score(a, b):
        return apply_fn(a, b)[:, class_idx].sum()

    g1, g2 = jax.grad(score, argnums=(0, 1))(x1, x2)
    return jnp.abs(g1).max(axis=-1), jnp.abs(g2).max(axis=-1)


def overlay(img, cam, alpha: float = 0.5):
    """Blend a [0,1] grayscale image (H, W) with a CAM (H, W) -> (H, W, 3)
    red-highlight overlay (the DDSM inference script's `_overlay_mask`
    analogue, `dataset_ddsmxray_twoview.py:621`)."""
    img = jnp.clip(img, 0.0, 1.0)
    base = jnp.stack([img, img, img], axis=-1)
    heat = jnp.stack([cam, jnp.zeros_like(cam), jnp.zeros_like(cam)],
                     axis=-1)
    return (1 - alpha * cam[..., None]) * base + alpha * heat
