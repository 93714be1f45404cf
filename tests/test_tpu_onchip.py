"""On-device A/B tests: REAL compiled Pallas kernels vs the composable
XLA path, at the production stage geometries (VERDICT r1 weak #4).

The default suite pins the CPU backend (tests/conftest.py), where these
tests auto-skip; run them on TPU hardware with

    XFMAMBA_TEST_TPU=1 python -m pytest tests/test_tpu_onchip.py -q

Interpret-mode tests pin the kernel *math*; these pin the *compiled*
kernels (Mosaic lowering, VMEM budgets, group pick, layout plumbing) at
the exact shapes the flagship model runs: stage maps 56²/28²/14²/7² with
dims 96/192/384/768 (XFMamba-S) and the fusion ops at 7²×768/N=16.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() == "cpu",
                       reason="on-device tier (set XFMAMBA_TEST_TPU=1)"),
]


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


def _record_err(name, err):
    """Emit the measured error on stdout in a machine-parseable form;
    scripts/record_onchip.py collects these into the ONCHIP_r{N}.json
    per-geometry error table (VERDICT r3 #3)."""
    print(f"ONCHIP_ERR {name} {float(err):.3e}", flush=True)
    return err


def _stage_block(d, H, W, B, seed=0):
    from xfmamba_tpu.models.vssm import VSSBlock
    blk = VSSBlock(hidden_dim=d, drop_path=0.0, ssm_d_state=1,
                   ssm_ratio=2.0, ssm_act="silu", ssm_conv=3,
                   ssm_conv_bias=False, ssm_init="v0",
                   forward_type="v05_noz", mlp_ratio=4.0, mlp_act="gelu",
                   dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, H, W, d),
                          jnp.bfloat16)
    variables = blk.init(jax.random.PRNGKey(seed), x)
    return blk, variables, x


@pytest.mark.parametrize("H,W,d", [
    (56, 56, 96),     # stage 0, L=3136
    (28, 28, 192),    # stage 1, L=784
    (14, 14, 384),    # stage 2, L=196
    (7, 7, 768),      # stage 3, L=49
])
def test_fused_block_matches_composable_on_device(H, W, d):
    from xfmamba_tpu.ops import vss_block_pallas as v1
    blk, variables, x = _stage_block(d, H, W, B=8)

    assert v1.FUSED_INFERENCE
    y_fused = np.asarray(jax.jit(
        lambda v, a: blk.apply(v, a))(variables, x), np.float32)

    v1.FUSED_INFERENCE = False
    try:
        y_comp = np.asarray(jax.jit(
            lambda v, a: blk.apply(v, a))(variables, x), np.float32)
    finally:
        v1.FUSED_INFERENCE = True
    assert _record_err(f"fused_block_{H}x{W}_d{d}",
                       _rel_err(y_fused, y_comp)) < 2e-2


def test_fused_model_matches_composable_on_device():
    """End-to-end XFMamba-S two-view forward: fused stage/fusion kernels
    vs the composable XLA path (bf16)."""
    from xfmamba_tpu.models.tops import two_view_xfmamba
    from xfmamba_tpu.ops import vss_block_pallas as v1

    model = two_view_xfmamba("small", outputs=2, dtype=jnp.bfloat16)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (8, 224, 224, 1),
                           jnp.bfloat16)
    x2 = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 1),
                           jnp.bfloat16)
    variables = model.init(jax.random.key(0), x1, x2)

    y_fused = np.asarray(jax.jit(
        lambda v, a, b: model.apply(v, a, b))(variables, x1, x2),
        np.float32)
    v1.FUSED_INFERENCE = False
    try:
        y_comp = np.asarray(jax.jit(
            lambda v, a, b: model.apply(v, a, b))(variables, x1, x2),
            np.float32)
    finally:
        v1.FUSED_INFERENCE = True
    assert _record_err("fused_model_e2e",
                       _rel_err(y_fused, y_comp)) < 2e-2


def test_fused_train_grads_match_on_device():
    """Fused training path (megakernel fwd + adjoint bwd) vs composable
    autodiff: loss and per-leaf grads at a multi-stage geometry."""
    from xfmamba_tpu.models.vssm import VSSM
    from xfmamba_tpu.ops import vss_block_pallas_v2 as v2

    model = VSSM(depths=(1, 1), dims=32, num_classes=2, ssm_d_state=1,
                 ssm_ratio=2.0, ssm_conv_bias=False,
                 forward_type="v05_noz", mlp_ratio=4.0, drop_path_rate=0.0,
                 downsample_version="v3", patchembed_version="v2",
                 dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64, 64, 3),
                          jnp.bfloat16)
    labels = jnp.zeros((8,), jnp.int32)
    variables = model.init(jax.random.key(0), x)
    params = variables["params"]

    def loss_fn(p):
        logits = model.apply({"params": p}, x, deterministic=False,
                             rngs={"dropout": jax.random.key(3)})
        onehot = jax.nn.one_hot(labels, 2)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits.astype(jnp.float32)) * onehot, -1))

    assert v2.FUSED_TRAIN
    lf, gf = jax.jit(jax.value_and_grad(loss_fn))(params)
    v2.FUSED_TRAIN = False
    try:
        lc, gc = jax.jit(jax.value_and_grad(loss_fn))(params)
    finally:
        v2.FUSED_TRAIN = True
    assert abs(float(lf) - float(lc)) < 1e-3
    errs = jax.tree_util.tree_map(_rel_err, gf, gc)
    assert _record_err("fused_train_grads_max",
                       max(jax.tree_util.tree_leaves(errs))) < 5e-2


def test_stage_train_grads_match_on_device():
    """Stage-stacked training path (`ops/vss_stage_train.py`: one stacked
    kernel forward + chained per-block adjoint backward) vs composable
    autodiff, at a depth-2 two-stage geometry that actually triggers it."""
    from xfmamba_tpu.models.vssm import VSSM
    from xfmamba_tpu.ops import vss_block_pallas_v2 as v2

    model = VSSM(depths=(2, 2), dims=32, num_classes=2, ssm_d_state=1,
                 ssm_ratio=2.0, ssm_conv_bias=False,
                 forward_type="v05_noz", mlp_ratio=4.0, drop_path_rate=0.0,
                 downsample_version="v3", patchembed_version="v2",
                 dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 64, 64, 3),
                          jnp.bfloat16)
    labels = jnp.zeros((8,), jnp.int32)
    params = model.init(jax.random.key(0), x)["params"]

    def loss_fn(p):
        logits = model.apply({"params": p}, x, deterministic=False,
                             rngs={"dropout": jax.random.key(3)})
        onehot = jax.nn.one_hot(labels, 2)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits.astype(jnp.float32)) * onehot, -1))

    assert v2.FUSED_STAGE_TRAIN and v2.FUSED_TRAIN
    lf, gf = jax.jit(jax.value_and_grad(loss_fn))(params)
    v2.FUSED_STAGE_TRAIN = False
    v2.FUSED_TRAIN = False
    try:
        lc, gc = jax.jit(jax.value_and_grad(loss_fn))(params)
    finally:
        v2.FUSED_STAGE_TRAIN = True
        v2.FUSED_TRAIN = True
    assert abs(float(lf) - float(lc)) < 1e-3
    errs = jax.tree_util.tree_map(_rel_err, gf, gc)
    assert _record_err("stage_train_grads_max",
                       max(jax.tree_util.tree_leaves(errs))) < 5e-2


@pytest.mark.parametrize("H,W,d", [
    (56, 56, 96),     # stage 0 — the geometry with the tightest headroom
    (28, 28, 192),
    (14, 14, 384),
    (7, 7, 768),
])
def test_adjoint_kernel_compiles_at_production_geometry(H, W, d):
    """ADVICE r4: the auto-sized adjoint VMEM limit had zero measured
    headroom at stage-0 — a geometry/compiler shift could turn a working
    compile into a Mosaic failure.  AOT-compile the backward kernel at
    every production train geometry (bs16 two-view -> backbone B=32) with
    the exact group the train path picks, so any regression in the sizing
    trips here instead of inside a user's train step."""
    from xfmamba_tpu.ops.vss_block_pallas import pack_vss_block_params
    from xfmamba_tpu.ops.vss_block_v2_adjoint import (
        pick_train_group, vss_block_bwd_call)

    B = 32
    di = 2 * d
    g = pick_train_group(B, H, W, d, di)
    assert g is not None, "train path would fall back to composable"

    blk, variables, x = _stage_block(d, H, W, B=B)
    p = variables["params"]
    packed = pack_vss_block_params(p, jnp.bfloat16, fuse_mlp=False)
    L = H * W
    xs = x.reshape(B, L, d)
    m = jnp.ones((B, L, 1), jnp.float32)
    cot = jnp.ones((B, L, d), jnp.bfloat16)
    compiled = vss_block_bwd_call.lower(
        xs, *packed, m, m, cot, H=H, W=W, conv_bias=False,
        fuse_mlp=False, group=g).compile()
    assert compiled is not None


def test_nk_adjoint_grads_match_on_device():
    """Compiled whole-map nk adjoint (fusion-op training backward) vs XLA
    autodiff of the composable path at a CrossSS2Dv5-class geometry
    (7x7, K=4, N=16, G=8 — the only aligned group at L=49)."""
    from xfmamba_tpu.models.ss2d import ss2d_core_from_projs
    from xfmamba_tpu.ops.selective_scan import selective_scan
    from xfmamba_tpu.ops.nk_scan_adjoint import nk_scan_train_from_projs

    B, H, W, D, K, N = 16, 7, 7, 256, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (B, H, W, D), jnp.float32)
    dts = 0.3 * jax.random.normal(ks[1], (B, H, W, K, D), jnp.float32)
    Bs = jax.random.normal(ks[2], (B, H, W, K, N), jnp.float32)
    Cs = jax.random.normal(ks[3], (B, H, W, K, N), jnp.float32)
    A = -jnp.exp(0.5 * jax.random.normal(ks[4], (K, D, N), jnp.float32))
    Dmat = jax.random.normal(ks[5], (K, D), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[6], (K, D), jnp.float32)
    wy = jax.random.normal(jax.random.PRNGKey(9), (B, H, W, D), jnp.float32)
    args = (x, dts, Bs, Cs, A, Dmat, bias)

    def grads(fn):
        def loss(*a):
            return jnp.sum(fn(*a) * wy)
        return jax.jit(jax.grad(loss, argnums=tuple(range(7))))(*args)

    g_ref = grads(lambda *a: ss2d_core_from_projs(
        *a, scan_mode="cross2d", scan_impl=selective_scan))
    g_k = grads(lambda *a: nk_scan_train_from_projs(
        *a, scan_mode="cross2d"))
    names = ("dx", "ddts", "dBs", "dCs", "dA", "dD", "dbias")
    for nm, a, r in zip(names, g_k, g_ref):
        assert _record_err(f"nk_adjoint_{nm}", _rel_err(a, r)) < 5e-3, nm


def test_nk_adjoint_compiles_at_production_geometry():
    """AOT-compile the nk adjoint at the full bs16 CrossSS2Dv5 geometry
    (B=48 streams, D=1536): the G=8 VMEM estimate must hold on-chip."""
    from xfmamba_tpu.ops.nk_scan_adjoint import (
        nk_scan_bwd_call, pick_nk_train_group)

    B, L, H, W, D, K, N = 48, 49, 7, 7, 1536, 4, 16
    g = pick_nk_train_group(B, L, W, D, K, N)
    assert g == 8
    kinds = ("row_f", "col_f", "row_r", "col_r")
    bf16 = jnp.bfloat16
    u = jnp.zeros((B, L, D), bf16)
    dts = jnp.zeros((B, L, K * D), bf16)
    Bs = jnp.zeros((B, L, K * N), bf16)
    Cs = jnp.zeros((B, L, K * N), bf16)
    A = jnp.zeros((K * N, D), jnp.float32)
    Dvec = jnp.zeros((K, D), jnp.float32)
    bias = jnp.zeros((K, D), jnp.float32)
    gy = jnp.zeros((B, L, D), bf16)
    compiled = nk_scan_bwd_call.lower(
        u, dts, Bs, Cs, A, Dvec, bias, gy, H=H, W=W, kinds=kinds,
        group=g).compile()
    assert compiled is not None


def test_ssd_pallas_matches_xla_on_device():
    """Compiled SSD kernel vs the XLA einsum path at an m2-like geometry."""
    from xfmamba_tpu.ops.ssd import ssd_chunk_scan
    from xfmamba_tpu.ops.ssd_pallas import ssd_chunk_scan_pallas

    b, s, h, p, g, n = 2, 196, 24, 16, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, s, h, p), jnp.float32)
    dt = jax.random.normal(ks[1], (b, s, h), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (h,), jnp.float32) * 0.3)
    B = jax.random.normal(ks[3], (b, s, g, n), jnp.float32)
    C = jax.random.normal(ks[4], (b, s, g, n), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[5], (h,), jnp.float32)
    D = jnp.ones((h,), jnp.float32)

    y_ref, fin_ref = ssd_chunk_scan(x, dt, A, B, C, chunk_size=64, D=D,
                                    dt_bias=bias, dt_softplus=True,
                                    return_final_states=True)
    y_k, fin_k = jax.jit(lambda *a: ssd_chunk_scan_pallas(
        *a, chunk_size=64, D=D, dt_bias=bias))(x, dt, A, B, C)
    # exponent path exact (HIGHEST); data matmuls at native MXU pass
    # precision (like the reference's tensor-core Triton dots) -> ~2e-3
    assert _record_err("ssd_fwd_y", _rel_err(y_k, y_ref)) < 5e-3
    assert _record_err("ssd_fwd_state", _rel_err(fin_k, fin_ref)) < 5e-3


def test_ssd_pallas_train_grads_match_on_device():
    """Compiled SSD fwd+adjoint pair vs XLA einsum autodiff at an m2-like
    geometry (the `pallas_train` backend of `ops/ssd.py`)."""
    from xfmamba_tpu.ops import ssd_pallas as sp
    from xfmamba_tpu.ops.ssd import ssd_chunk_scan

    b, s, h, p, g, n = 2, 196, 24, 16, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    x = jax.random.normal(ks[0], (b, s, h, p), jnp.float32)
    dt = jax.random.normal(ks[1], (b, s, h), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (h,), jnp.float32) * 0.3)
    B = jax.random.normal(ks[3], (b, s, g, n), jnp.float32)
    C = jax.random.normal(ks[4], (b, s, g, n), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[5], (h,), jnp.float32)
    D = jnp.ones((h,), jnp.float32) * 0.7
    wy = jax.random.normal(jax.random.PRNGKey(9), (b, s, h, p), jnp.float32)

    def loss_ref(x, dt, A, B, C, D, bias):
        y = ssd_chunk_scan(x, dt, A, B, C, chunk_size=64, D=D, dt_bias=bias,
                           dt_softplus=True)
        return jnp.sum(y * wy)

    def loss_k(x, dt, A, B, C, D, bias):
        y, _ = sp.ssd_chunk_scan_pallas_train(x, dt, A, B, C, 64, D, bias,
                                              None)
        return jnp.sum(y * wy)

    args = (x, dt, A, B, C, D, bias)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=range(7)))(*args)
    g_k = jax.jit(jax.grad(loss_k, argnums=range(7)))(*args)
    for nm, a, r in zip(("dx", "ddt", "dA", "dB", "dC", "dD", "dbias"),
                        g_k, g_ref):
        assert _record_err(f"ssd_train_{nm}", _rel_err(a, r)) < 5e-3, nm
