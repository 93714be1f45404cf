"""Selective-scan (Mamba S6) recurrence for TPU.

Semantics contract (mirrors the reference dispatcher
``/root/reference/models/csms6s.py:25-126`` and the CUDA kernel
``selective_scan_fwd_kernel.cuh``):

    delta' = softplus(delta + delta_bias)                (optional bias/softplus)
    h[t]   = exp(delta'[t] * A) * h[t-1] + delta'[t] * B[t] * u[t]
    y[t]   = <C[t], h[t]> + D * u[t]

with fp32 state regardless of input dtype.  ``B``/``C`` are shared across a
channel group: channels are laid out as K groups of C channels (``D = K*C``)
and group ``k`` uses ``B[:, :, k]`` / ``C[:, :, k]``.

TPU-first layout: **time-major, channel-last** ``(B, L, D)`` so that the
channel axis lands on vector lanes and XLA can keep the whole recurrence in
registers/VMEM.  A thin wrapper (`selective_scan_torch_layout`) accepts the
reference's ``(B, D, L)`` layout for parity tests.

Two implementations:

- `selective_scan_seq`  : `jax.lax.scan` over L.  The slow, obviously-correct
  oracle (mirrors the role of ``selective_scan_torch``).
- `selective_scan`      : `jax.lax.associative_scan` (Blelloch) over L — the
  same math the CUDA kernel expresses with cub::BlockScan over
  ``(exp(dA), dBu)`` pairs.  O(log L) depth, fully parallel on the VPU, and
  differentiable by ordinary JAX autodiff.

The fused Pallas kernel lives in `xfmamba_tpu.ops.selective_scan_pallas` and
is numerically interchangeable with these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _prepare(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus):
    """Common fp32 promotion + delta preprocessing.

    Args (time-major):
      u:          (B, L, KC)
      delta:      (B, L, KC)
      A:          (KC, N)
      Bmat, Cmat: (B, L, K, N)
      D:          (KC,) or None
      delta_bias: (KC,) or None
    Returns fp32 (u, delta, A, Bmat, Cmat, D).
    """
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    Bmat = Bmat.astype(jnp.float32)
    Cmat = Cmat.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    if D is not None:
        D = D.astype(jnp.float32)
    return u, delta, A, Bmat, Cmat, D


def _group_expand(x, KC):
    """(B, L, K, N) -> (B, L, KC, N) by repeating each group over its C channels."""
    Bsz, L, K, N = x.shape
    C = KC // K
    x = jnp.repeat(x, C, axis=2)  # (B, L, K*C, N) with group-major order
    return x


def selective_scan_seq(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                       delta_softplus=True):
    """Sequential `lax.scan` oracle.  Shapes as in `_prepare`; returns (B, L, KC) fp32."""
    u, delta, A, Bmat, Cmat, D = _prepare(u, delta, A, Bmat, Cmat, D,
                                          delta_bias, delta_softplus)
    Bsz, L, KC = u.shape
    N = A.shape[1]
    K = Bmat.shape[2]
    Bx = _group_expand(Bmat, KC)  # (B, L, KC, N)
    Cx = _group_expand(Cmat, KC)

    dA = jnp.exp(delta[..., None] * A)           # (B, L, KC, N)
    dBu = delta[..., None] * Bx * u[..., None]   # (B, L, KC, N)

    def step(h, inp):
        a_t, b_t, c_t = inp
        h = a_t * h + b_t
        y = jnp.sum(h * c_t, axis=-1)
        return h, y

    h0 = jnp.zeros((Bsz, KC, N), jnp.float32)
    # scan over time: move L to leading axis
    _, ys = jax.lax.scan(
        step, h0,
        (jnp.moveaxis(dA, 1, 0), jnp.moveaxis(dBu, 1, 0), jnp.moveaxis(Cx, 1, 0)),
    )
    y = jnp.moveaxis(ys, 0, 1)  # (B, L, KC)
    if D is not None:
        y = y + u * D
    return y


def _assoc_combine(x, y):
    """Associative combine for h_t = a_t h_{t-1} + b_t: x is earlier, y later."""
    a_x, b_x = x
    a_y, b_y = y
    return a_x * a_y, a_y * b_x + b_y


def selective_scan(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                   delta_softplus=True, reverse=False, unroll=1):
    """Parallel associative-scan implementation (time-major).

    Args:
      u, delta:   (B, L, KC)
      A:          (KC, N)
      Bmat, Cmat: (B, L, K, N)   (group-broadcast over KC//K channels)
      D:          (KC,) optional skip
      delta_bias: (KC,) optional
      reverse:    scan right-to-left (used for the flipped cross-scan
                  directions — equivalent to flip+scan+flip in the reference,
                  without materializing the flips).
    Returns:
      y: (B, L, KC) float32.
    """
    u, delta, A, Bmat, Cmat, D = _prepare(u, delta, A, Bmat, Cmat, D,
                                          delta_bias, delta_softplus)
    KC = u.shape[2]
    Bx = _group_expand(Bmat, KC)
    Cx = _group_expand(Cmat, KC)

    dA = jnp.exp(delta[..., None] * A)           # (B, L, KC, N)
    dBu = delta[..., None] * Bx * u[..., None]   # (B, L, KC, N)

    _, h = jax.lax.associative_scan(_assoc_combine, (dA, dBu), axis=1,
                                    reverse=reverse)
    y = jnp.sum(h * Cx, axis=-1)                 # (B, L, KC)
    if D is not None:
        y = y + u * D
    return y


def selective_scan_torch_layout(u, delta, A, Bmat, Cmat, D=None,
                                delta_bias=None, delta_softplus=True,
                                impl=None):
    """Reference-layout wrapper: u/delta (B, KC, L), B/C (B, K, N, L).

    Matches ``selective_scan_fn`` (`csms6s.py:112`) for parity tests.
    Returns (B, KC, L) fp32.
    """
    fn = impl or selective_scan
    y = fn(
        jnp.swapaxes(u, 1, 2),
        jnp.swapaxes(delta, 1, 2),
        A,
        jnp.transpose(Bmat, (0, 3, 1, 2)),
        jnp.transpose(Cmat, (0, 3, 1, 2)),
        D, delta_bias, delta_softplus,
    )
    return jnp.swapaxes(y, 1, 2)
