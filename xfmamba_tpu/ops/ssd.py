"""Mamba-2 / SSD (state-space duality) chunked scan for TPU.

TPU-native equivalent of the reference's vendored Triton package
``/root/reference/models/mamba2/`` (state-spaces/mamba ops):

- `segsum`                  — `ssd_minimal.py:22-31`
- `ssd_chunk_scan`          — the public `selective_scan_chunk_fn` /
  `mamba_chunk_scan_combined` semantics (`ssd_minimal.py:85-146`,
  `ssd_combined.py:569`): chunked quadratic-within / linear-across
  decomposition of `h[t] = exp(dt*A)h[t-1] + dt*B*x[t]`, `y = C·h (+ D·x)`.
- `selective_state_update`  — single-token decode step
  (`selective_state_update.py:202-263` reference impl), functional.
- `layernorm_gated` / `rmsnorm_gated` — gated norms
  (`layernorm_gated.py:380-437`).
- `swiglu`                  — `k_activations.py:44-117`.
- `causal_conv1d` / `mamba_split_conv1d_scan` — the fused split-conv1d
  entry (`ssd_combined.py:760-984`), unused by the reference's own model
  code; provided for capability parity.

Design (TPU-first): where the reference hand-schedules ~4k lines of Triton
(ssd_chunk_state/ssd_chunk_scan/ssd_state_passing/ssd_bmm), the chunked SSD
algorithm is expressed here as a handful of batched einsums — each one a
single large MXU contraction — plus one O(n_chunks²) state-passing matmul.
XLA fuses the elementwise decay/mask prologues into the contractions; no
Pallas needed for this path (the quadratic intra-chunk term IS a matmul).
Gradients come from XLA autodiff of the same graph, replacing the reference's
11 hand-written backward kernels.

All internal math is float32 (matching the Triton kernels' fp32
accumulators); outputs are cast back to the input dtype.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def segsum(x):
    """Stable segment-sum: (..., T) -> (..., T, T) where
    ``out[..., i, j] = sum_{j < r <= i} x[..., r]`` for i >= j, else -inf
    (`ssd_minimal.py:22-31`)."""
    T = x.shape[-1]
    r = jnp.arange(T)[:, None]
    c = jnp.arange(T)[None, :]
    xx = jnp.broadcast_to(x[..., :, None], x.shape + (T,))
    xx = jnp.where(r > c, xx, 0.0)
    s = jnp.cumsum(xx, axis=-2)
    return jnp.where(r >= c, s, -jnp.inf)


def _pick_chunk_size(seqlen: int, chunk_size: int) -> int:
    """Halve chunk_size until it divides seqlen
    (`ssd_minimal.py:107-108`)."""
    while seqlen % chunk_size != 0:
        chunk_size >>= 1
        if chunk_size == 0:
            raise ValueError(f"no chunk size divides seqlen={seqlen}")
    return chunk_size


def ssd_chunk_scan(x, dt, A, B, C, chunk_size, D=None, z=None, dt_bias=None,
                   initial_states=None, seq_idx=None, dt_softplus=False,
                   dt_limit=(0.0, float("inf")), return_final_states=False,
                   backend=None):
    """Chunked SSD scan (Mamba-2), semantics of
    ``mamba_chunk_scan_combined_torch`` (`ssd_minimal.py:85-127`).

    Args:
      x:  (batch, seqlen, nheads, headdim)
      dt: (batch, seqlen, nheads)
      A:  (nheads,)           — negative decay rates
      B:  (batch, seqlen, ngroups, dstate)
      C:  (batch, seqlen, ngroups, dstate)
      chunk_size: int (auto-halved until it divides seqlen)
      D:  (nheads,) or (nheads, headdim) skip, optional
      z:  (batch, seqlen, nheads, headdim) silu-gate, optional
      dt_bias: (nheads,), optional
      initial_states: (batch, nheads, headdim, dstate), optional
      dt_softplus: apply softplus to dt (+bias)
      dt_limit: (lo, hi) clamp on dt after softplus
    Returns:
      y (batch, seqlen, nheads, headdim) in x.dtype, and the final state
      (batch, nheads, headdim, dstate) fp32 if return_final_states.
    """
    del seq_idx  # varlen packing unsupported (unused by the reference model)
    b, s, h, p = x.shape
    _, _, g, n = B.shape

    if backend == "pallas":
        # fused TPU kernel (`ops/ssd_pallas.py`) — forward-only perf path
        # for the shipped m0_noz surface; callers gate on `ssd_supported`.
        assert z is None and dt_softplus and dt_limit == (0.0, float("inf"))
        from xfmamba_tpu.ops.ssd_pallas import ssd_chunk_scan_pallas
        y, final_state = ssd_chunk_scan_pallas(
            x, dt, A, B, C, chunk_size, D=D, dt_bias=dt_bias,
            initial_states=initial_states)
        if return_final_states:
            return y, final_state
        return y

    if backend == "pallas_train":
        # differentiable fused TPU pair (`ops/ssd_pallas.py`): forward with
        # chunk-state checkpoints + reverse-chunk adjoint kernel — the TPU
        # counterpart of the reference Triton backward
        # (`ssd_combined.py:351`, `ssd_chunk_scan.py:1333-1703`).
        assert z is None and dt_softplus and dt_limit == (0.0, float("inf"))
        from xfmamba_tpu.ops.ssd_pallas import ssd_chunk_scan_pallas_train
        y, final_state = ssd_chunk_scan_pallas_train(
            x, dt, A, B, C, chunk_size, D, dt_bias, initial_states)
        if return_final_states:
            return y, final_state
        return y

    chunk_size = _pick_chunk_size(s, chunk_size)
    nc = s // chunk_size

    xf = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    lo, hi = dt_limit
    if lo > 0.0 or hi < float("inf"):
        dt = jnp.clip(dt, lo, None if math.isinf(hi) else hi)

    if h != g:
        assert h % g == 0
        rep = h // g
        B = jnp.repeat(B, rep, axis=2)
        C = jnp.repeat(C, rep, axis=2)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)

    u = xf * dt[..., None]                     # (b, s, h, p)
    w = A.astype(jnp.float32) * dt             # (b, s, h)

    # chunk: (b, nc, l, ...)
    X = u.reshape(b, nc, chunk_size, h, p)
    Bc = Bf.reshape(b, nc, chunk_size, h, n)
    Cc = Cf.reshape(b, nc, chunk_size, h, n)
    wc = jnp.transpose(w.reshape(b, nc, chunk_size, h),
                       (0, 3, 1, 2))           # (b, h, nc, l)
    w_cumsum = jnp.cumsum(wc, axis=-1)

    # 1. intra-chunk (diagonal blocks): one big MXU contraction per term
    Lmask = jnp.exp(segsum(wc))                # (b, h, nc, l, l)
    Y_diag = jnp.einsum("bclhn,bcshn,bhcls,bcshp->bclhp",
                        Cc, Bc, Lmask, X, optimize=True,
                        precision=jax.lax.Precision.HIGH)

    # 2. per-chunk end states
    decay_states = jnp.exp(w_cumsum[..., -1:] - w_cumsum)   # (b, h, nc, l)
    states = jnp.einsum("bclhn,bhcl,bclhp->bchpn",
                        Bc, decay_states, X, optimize=True,
                        precision=jax.lax.Precision.HIGH)

    # 3. inter-chunk state passing (O(nc²) matmul over chunk boundaries)
    if initial_states is None:
        init = jnp.zeros((b, 1, h, p, n), jnp.float32)
    else:
        init = initial_states.astype(jnp.float32)[:, None]
    states = jnp.concatenate([init, states], axis=1)        # (b, nc+1,h,p,n)
    chunk_decay = jnp.pad(w_cumsum[..., -1], ((0, 0), (0, 0), (1, 0)))
    decay_chunk = jnp.exp(segsum(chunk_decay))               # (b,h,nc+1,nc+1)
    new_states = jnp.einsum("bhzc,bchpn->bzhpn", decay_chunk, states,
                            optimize=True,
                        precision=jax.lax.Precision.HIGH)
    states, final_state = new_states[:, :-1], new_states[:, -1]

    # 4. state -> output within each chunk
    state_decay_out = jnp.exp(w_cumsum)                      # (b, h, nc, l)
    Y_off = jnp.einsum("bclhn,bchpn,bhcl->bclhp",
                       Cc, states, state_decay_out, optimize=True,
                        precision=jax.lax.Precision.HIGH)

    y = (Y_diag + Y_off).reshape(b, s, h, p)
    if D is not None:
        Df = D.astype(jnp.float32)
        if Df.ndim == 1:
            Df = Df[:, None]
        y = y + Df * xf
    if z is not None:
        zf = z.astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))
    y = y.astype(x.dtype)
    if return_final_states:
        return y, final_state
    return y


# alias matching the reference public name (`ssd_minimal.py:144-146`)
selective_scan_chunk_fn = ssd_chunk_scan


def selective_state_update(state, x, dt, A, B, C, D=None, z=None,
                           dt_bias=None, dt_softplus=False):
    """Single-token decode update
    (`selective_state_update.py:202-263` reference semantics), functional:

        state' = state * exp(dt*A) + dt * B * x
        y      = einsum(state', C) + D*x   [optionally * silu(z)]

    Shapes (head-structured variants broadcast the same way as the ref):
      state: (batch, ..., dim, dstate);  x/dt: (batch, ..., dim)
      A: (..., dim, dstate) or (..., dim) scalar-per-channel broadcast
      B, C: (batch, ..., dstate) group-shared over dim
    Returns (new_state, y) — no in-place mutation (functional JAX).
    """
    f32 = jnp.float32
    state = state.astype(f32)
    xf = x.astype(f32)
    dt = dt.astype(f32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(f32)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    Af = A.astype(f32)
    if Af.ndim == state.ndim - 2:        # per-channel scalar A
        Af = Af[..., None]
    dA = jnp.exp(dt[..., None] * Af)                       # (..., dim, n)
    Bb = B.astype(f32)[..., None, :]                       # (..., 1, n)
    Cb = C.astype(f32)[..., None, :]
    dBx = dt[..., None] * Bb * xf[..., None]
    new_state = state * dA + dBx
    y = jnp.sum(new_state * Cb, axis=-1)                   # (..., dim)
    if D is not None:
        y = y + D.astype(f32) * xf
    if z is not None:
        zf = z.astype(f32)
        y = y * (zf * jax.nn.sigmoid(zf))
    return new_state, y.astype(x.dtype)


def layernorm_gated(x, weight, bias=None, z=None, eps: float = 1e-5,
                    group_size=None, norm_before_gate: bool = True,
                    is_rms_norm: bool = False):
    """Gated LayerNorm/RMSNorm (`layernorm_gated.py:380-437`).

    norm_before_gate=True :  out = norm(x) * silu(z)
    norm_before_gate=False:  out = norm(x * silu(z))
    group_size: normalize over channel groups of this size (None = all).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if z is not None and not norm_before_gate:
        zf = z.astype(jnp.float32)
        xf = xf * (zf * jax.nn.sigmoid(zf))
    d = xf.shape[-1]
    gs = group_size or d
    assert d % gs == 0
    xg = xf.reshape(xf.shape[:-1] + (d // gs, gs))
    if is_rms_norm:
        var = jnp.mean(xg * xg, axis=-1, keepdims=True)
        xg = xg * jax.lax.rsqrt(var + eps)
    else:
        mu = jnp.mean(xg, axis=-1, keepdims=True)
        var = jnp.mean((xg - mu) ** 2, axis=-1, keepdims=True)
        xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(xf.shape) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if z is not None and norm_before_gate:
        zf = z.astype(jnp.float32)
        out = out * (zf * jax.nn.sigmoid(zf))
    return out.astype(dtype)


def rmsnorm_gated(x, weight, z=None, eps: float = 1e-5, group_size=None,
                  norm_before_gate: bool = True):
    """RMSNorm with z-gating (`layernorm_gated.py:415-437`)."""
    return layernorm_gated(x, weight, bias=None, z=z, eps=eps,
                           group_size=group_size,
                           norm_before_gate=norm_before_gate,
                           is_rms_norm=True)


def swiglu(e, g):
    """silu(e) * g (`k_activations.py:44-117`)."""
    return e * jax.nn.sigmoid(e) * g


def causal_conv1d(x, weight, bias=None, activation=None):
    """Depthwise causal 1-D conv, semantics of the `causal_conv1d` package
    the reference wraps (`ssd_combined.py:22-25`, used at `:748,:971`):
    left-pad by width-1, per-channel taps, optional bias + silu.

    Args: x (batch, seqlen, d); weight (d, width); bias (d,) optional.
    Returns (batch, seqlen, d) in x.dtype; math in float32.
    """
    b, s, d = x.shape
    width = weight.shape[1]
    xf = x.astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        xf, weight.astype(jnp.float32)[:, None, :],     # (d, 1, width) OIW
        window_strides=(1,), padding=((width - 1, 0),),
        dimension_numbers=("NWC", "OIW", "NWC"),
        feature_group_count=d)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if activation in ("silu", "swish"):
        out = out * jax.nn.sigmoid(out)
    else:
        assert activation is None
    return out.astype(x.dtype)


def mamba_split_conv1d_scan(zxbcdt, conv1d_weight, conv1d_bias, dt_bias, A,
                            D, chunk_size, initial_states=None, seq_idx=None,
                            dt_limit=(0.0, float("inf")),
                            return_final_states=False, activation="silu",
                            rmsnorm_weight=None, rmsnorm_eps=1e-6,
                            outproj_weight=None, outproj_bias=None,
                            headdim=None, ngroups=1, norm_before_gate=True):
    """Fused split-conv1d SSD entry, semantics of the reference's
    `mamba_split_conv1d_scan_combined` (`ssd_combined.py:760-984`): one
    packed projection output `zxbcdt` is split into [swiglu-pair zx0 |
    z-gate | x/B/C conv input | dt], run through a causal depthwise conv,
    the chunked SSD scan, an optional gated RMSNorm, and an optional out
    projection.  Unused by the reference's own model code — provided for
    capability parity.  Gradients via XLA autodiff of this graph (replacing
    the reference's hand-written `MambaSplitConv1dScanCombinedFn.backward`).

    Args (torch-layout contracts preserved):
      zxbcdt: (batch, seqlen, 2*d_nonssm + 2*dim + 2*ngroups*dstate + nheads)
      conv1d_weight: (dim + 2*ngroups*dstate, width); conv1d_bias: same d
      dt_bias, A: (nheads,);  D: (nheads,) [needs headdim] or (nheads, headdim)
      rmsnorm_weight: (dim,) — when given, the scan is ungated and the gate
        is applied in the group-RMSNorm (group_size = dim // ngroups)
      outproj_weight: (out_dim, dim + d_nonssm) torch Linear convention
    Returns out (batch, seqlen, out_dim | d_nonssm + dim), plus the final
    fp32 state (batch, nheads, headdim, dstate) if return_final_states.
    """
    del seq_idx  # varlen packing unsupported (unused by the reference model)
    if D.ndim == 1:
        assert headdim is not None
        nheads = D.shape[0]
    else:
        nheads, headdim = D.shape
    batch, seqlen, packed = zxbcdt.shape
    dim = nheads * headdim
    assert nheads % ngroups == 0
    dstate = (conv1d_weight.shape[0] - dim) // ngroups // 2
    d_nonssm = (packed - 2 * dim - 2 * ngroups * dstate - nheads) // 2
    assert d_nonssm >= 0
    zx0, z, xBC, dt = jnp.split(
        zxbcdt,
        [2 * d_nonssm, 2 * d_nonssm + dim, 2 * d_nonssm + 2 * dim
         + 2 * ngroups * dstate], axis=-1)

    xBC = causal_conv1d(xBC, conv1d_weight, conv1d_bias,
                        activation=activation)
    x, B, C = jnp.split(xBC, [dim, dim + ngroups * dstate], axis=-1)
    x = x.reshape(batch, seqlen, nheads, headdim)
    B = B.reshape(batch, seqlen, ngroups, dstate)
    C = C.reshape(batch, seqlen, ngroups, dstate)
    zh = z.reshape(batch, seqlen, nheads, headdim)

    out, final_states = ssd_chunk_scan(
        x, dt, A, B, C, chunk_size, D=D,
        z=zh if rmsnorm_weight is None else None, dt_bias=dt_bias,
        initial_states=initial_states, dt_softplus=True, dt_limit=dt_limit,
        return_final_states=True)
    out = out.reshape(batch, seqlen, dim)
    if rmsnorm_weight is not None:
        out = rmsnorm_gated(out, rmsnorm_weight, z=z, eps=rmsnorm_eps,
                            group_size=dim // ngroups,
                            norm_before_gate=norm_before_gate)
    if d_nonssm > 0:
        out = jnp.concatenate(
            [swiglu(zx0[..., :d_nonssm], zx0[..., d_nonssm:]).astype(out.dtype),
             out], axis=-1)
    if outproj_weight is not None:
        out = out @ outproj_weight.T.astype(out.dtype)
        if outproj_bias is not None:
            out = out + outproj_bias.astype(out.dtype)
    else:
        assert outproj_bias is None
    if return_final_states:
        return out, final_states
    return out
