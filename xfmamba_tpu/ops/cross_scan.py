"""Cross-scan / cross-merge: the four 2-D traversal orders of VMamba's SS2D.

Reference semantics: ``/root/reference/models/csm_triton.py:22-179``
(``cross_scan_fwd`` / ``cross_merge_fwd`` and the one-by-one variants).  The
four directions (``scans=0``, "cross2d") are

    k=0 : row-major (H then W)            k=1 : column-major (W then H)
    k=2 : row-major reversed              k=3 : column-major reversed

``scans=1`` ("unidi") repeats the row-major traversal 4x; ``scans=2``
("bidi") uses [row, row, row-rev, row-rev].

TPU-first note: the production SS2D path does **not** materialize the four
flipped copies.  Reversed directions are expressed as ``reverse=True``
associative scans (flip∘scan∘flip ≡ reverse-scan) and column-major directions
as a single (H, W) transpose — see `directional_scan_2d`.  The materializing
forms below exist for parity tests, for the one-by-one (SS2Dv3 "xv") variant,
and as the layout contract of the Pallas kernel.

All functions are pure jnp (transpose/flip/reshape lower to cheap XLA copies)
so ordinary autodiff yields the exact adjoints — which is what the reference's
hand-written autograd Functions compute (backward of scan is merge and vice
versa, ``csm_triton.py:182-273``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def _transpose_hw(x_bhwc):
    return jnp.swapaxes(x_bhwc, 1, 2)


def cross_scan(x, scans: int = 0):
    """x: (B, H, W, C) -> xs: (B, 4, L, C) with L = H*W (channel-last analogue
    of ``cross_scan_fwd`` with channel-first in/out, `csm_triton.py:22-34`)."""
    B, H, W, C = x.shape
    L = H * W
    row = x.reshape(B, L, C)
    if scans == 0:
        col = _transpose_hw(x).reshape(B, L, C)
        return jnp.stack([row, col, row[:, ::-1], col[:, ::-1]], axis=1)
    elif scans == 1:
        return jnp.broadcast_to(row[:, None], (B, 4, L, C))
    elif scans == 2:
        rev = row[:, ::-1]
        return jnp.stack([row, row, rev, rev], axis=1)
    raise ValueError(f"unsupported scans={scans}")


def cross_merge(ys, H: int, W: int, scans: int = 0):
    """ys: (B, 4, L, C) -> y: (B, L, C); inverse traversal + sum
    (``cross_merge_fwd``, `csm_triton.py:56-67`; summation order preserved)."""
    B, K, L, C = ys.shape
    assert K == 4 and L == H * W
    if scans == 0:
        y01 = ys[:, 0] + ys[:, 2, ::-1]
        y23 = ys[:, 1] + ys[:, 3, ::-1]
        # undo column-major: (B, L, C) laid out W-major -> row-major
        y23 = _transpose_hw(y23.reshape(B, W, H, C)).reshape(B, L, C)
        return y01 + y23
    elif scans == 1:
        return ys.sum(axis=1)
    elif scans == 2:
        return (ys[:, 0] + ys[:, 2, ::-1]) + (ys[:, 1] + ys[:, 3, ::-1])
    raise ValueError(f"unsupported scans={scans}")


def cross_scan_1b1(xs, scans: int = 0):
    """One-by-one variant: xs (B, 4, H, W, C) -> (B, 4, L, C); each of the four
    inputs is traversed in its own direction (`csm_triton.py:88-106`)."""
    B, K, H, W, C = xs.shape
    L = H * W
    assert K == 4
    r = lambda k: xs[:, k].reshape(B, L, C)
    t = lambda k: _transpose_hw(xs[:, k]).reshape(B, L, C)
    if scans == 0:
        return jnp.stack([r(0), t(1), r(2)[:, ::-1], t(3)[:, ::-1]], axis=1)
    elif scans == 1:
        return xs.reshape(B, K, L, C)
    elif scans == 2:
        return jnp.stack([r(0), r(1), r(2)[:, ::-1], r(3)[:, ::-1]], axis=1)
    raise ValueError(f"unsupported scans={scans}")


def cross_merge_1b1(ys, H: int, W: int, scans: int = 0):
    """Inverse of `cross_scan_1b1` without the sum: (B, 4, L, C) -> (B, 4, L, C)
    each direction mapped back to row-major order (`csm_triton.py:134-153`)."""
    B, K, L, C = ys.shape
    assert K == 4 and L == H * W
    inv_t = lambda y: _transpose_hw(y.reshape(B, W, H, C)).reshape(B, L, C)
    if scans == 0:
        return jnp.stack(
            [ys[:, 0], inv_t(ys[:, 1]), ys[:, 2, ::-1], inv_t(ys[:, 3, ::-1])],
            axis=1)
    elif scans == 1:
        return ys
    elif scans == 2:
        return jnp.stack(
            [ys[:, 0], ys[:, 1], ys[:, 2, ::-1], ys[:, 3, ::-1]], axis=1)
    raise ValueError(f"unsupported scans={scans}")


def directional_scan_2d(
    scan_fn: Callable,
    H: int,
    W: int,
    per_dir_inputs: Sequence,
    scans: int = 0,
):
    """Flip-free fused cross-scan -> scan -> cross-merge.

    Runs ``scan_fn(k, inputs_k, transposed, reverse)`` for each direction k and
    merges the outputs, where directions are realised as:

      k=0: row-major forward        k=1: column-major forward (transposed=True)
      k=2: row-major reverse        k=3: column-major reverse

    ``scan_fn`` must return y of shape (B, L', C) in the *scan order* it was
    given (L' = H*W; column-major directions receive/return W-major order).
    Reversed directions must be handled by the callee with a reverse scan so
    outputs come back aligned with their input order (no flips anywhere).

    Merge order matches ``cross_merge_fwd`` scans=0: (y0 + y2) + T^-1(y1 + y3).
    """
    B = None
    if scans == 0:
        y0 = scan_fn(0, per_dir_inputs[0], False, False)
        y2 = scan_fn(2, per_dir_inputs[2], False, True)
        y1 = scan_fn(1, per_dir_inputs[1], True, False)
        y3 = scan_fn(3, per_dir_inputs[3], True, True)
        y01 = y0 + y2
        y23 = y1 + y3
        B, L, C = y23.shape
        y23 = _transpose_hw(y23.reshape(B, W, H, C)).reshape(B, L, C)
        return y01 + y23
    elif scans == 1:
        ys = [scan_fn(k, per_dir_inputs[k], False, False) for k in range(4)]
        return ((ys[0] + ys[1]) + ys[2]) + ys[3]
    elif scans == 2:
        y0 = scan_fn(0, per_dir_inputs[0], False, False)
        y1 = scan_fn(1, per_dir_inputs[1], False, False)
        y2 = scan_fn(2, per_dir_inputs[2], False, True)
        y3 = scan_fn(3, per_dir_inputs[3], False, True)
        return (y0 + y2) + (y1 + y3)
    raise ValueError(f"unsupported scans={scans}")
