"""Golden logit-parity tests: the TPU models with weights converted from a
randomly-initialized PyTorch reference model must reproduce the reference's
outputs to fp32 tolerance (BASELINE north-star requirement).

Covers: VSSM classifier (v05_noz and v0 paths), Backbone_VSSM feature
pyramid, ShallowFusionBlock_v4, CSSFVSSLayer_v5, and the full
TwoViewXFMambaTop.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_oracle import reference_available, load_reference_module

from xfmamba_tpu.checkpoint.convert import (
    convert_vssm_state_dict, convert_xfmamba_state_dict, verify_tree_matches)
from xfmamba_tpu.models.vssm import VSSM
from xfmamba_tpu.models.fusion import CSSFVSSLayer, ShallowFusionBlock
from xfmamba_tpu.models.tops import TwoViewXFMamba

pytestmark = [
    pytest.mark.skipif(not reference_available(),
                       reason="reference not mounted"),
    pytest.mark.slow,
]


def _sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _nhwc(x_nchw):
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def test_vssm_v05noz_parity():
    torch = pytest.importorskip("torch")
    ref_vmamba = load_reference_module("vmamba")
    torch.manual_seed(0)
    kw = dict(depths=[1, 1, 1, 1], dims=16, drop_path_rate=0.0,
              patch_size=4, in_chans=3, num_classes=5,
              ssm_d_state=1, ssm_ratio=2.0, ssm_dt_rank="auto",
              ssm_act_layer="silu", ssm_conv=3, ssm_conv_bias=False,
              ssm_init="v0", forward_type="v05_noz", mlp_ratio=4.0,
              mlp_act_layer="gelu", norm_layer="ln2d",
              downsample_version="v3", patchembed_version="v2")
    ref = ref_vmamba.VSSM(**kw).eval()

    ours = VSSM(depths=(1, 1, 1, 1), dims=16, num_classes=5,
                ssm_d_state=1, ssm_ratio=2.0, ssm_conv_bias=False,
                forward_type="v05_noz", mlp_ratio=4.0, drop_path_rate=0.0,
                downsample_version="v3", patchembed_version="v2")

    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(
        np.float32)
    with torch.no_grad():
        y_ref = ref(torch.tensor(x)).numpy()

    params = ours.init(jax.random.key(0), _nhwc(x))["params"]
    conv = convert_vssm_state_dict(_sd(ref))
    verify_tree_matches(conv, params)
    y = ours.apply({"params": conv}, _nhwc(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


def test_vssm_v0_parity():
    torch = pytest.importorskip("torch")
    ref_vmamba = load_reference_module("vmamba")
    torch.manual_seed(1)
    kw = dict(depths=[1, 1], dims=16, drop_path_rate=0.0,
              patch_size=4, in_chans=3, num_classes=3,
              ssm_d_state=16, ssm_ratio=2.0, ssm_dt_rank="auto",
              ssm_act_layer="silu", ssm_conv=3, ssm_conv_bias=True,
              ssm_init="v0", forward_type="v0", mlp_ratio=0.0,
              mlp_act_layer="gelu", norm_layer="ln",
              downsample_version="v1", patchembed_version="v1")
    ref = ref_vmamba.VSSM(**kw).eval()

    ours = VSSM(depths=(1, 1), dims=16, num_classes=3, ssm_d_state=16,
                ssm_ratio=2.0, ssm_conv_bias=True, forward_type="v0",
                mlp_ratio=0.0, drop_path_rate=0.0,
                downsample_version="v1", patchembed_version="v1")

    x = np.random.default_rng(1).standard_normal((2, 3, 32, 32)).astype(
        np.float32)
    with torch.no_grad():
        y_ref = ref(torch.tensor(x)).numpy()

    params = ours.init(jax.random.key(0), _nhwc(x))["params"]
    conv = convert_vssm_state_dict(_sd(ref))
    verify_tree_matches(conv, params)
    y = ours.apply({"params": conv}, _nhwc(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


def test_backbone_vssm_parity():
    torch = pytest.importorskip("torch")
    ref_fv = load_reference_module("fusion_vmamba")
    torch.manual_seed(2)
    ref = ref_fv.Backbone_VSSM(depths=[1, 1, 1, 1], dims=16,
                               drop_path_rate=0.0, ssm_ratio=2.0,
                               pretrained=None).eval()

    ours = VSSM(depths=(1, 1, 1, 1), dims=16, num_classes=1000,
                ssm_d_state=1, ssm_ratio=2.0, ssm_conv_bias=False,
                forward_type="v05_noz", mlp_ratio=4.0, drop_path_rate=0.0,
                downsample_version="v3", patchembed_version="v2",
                out_indices=(0, 1, 2, 3))

    x = np.random.default_rng(2).standard_normal((1, 3, 32, 32)).astype(
        np.float32)
    with torch.no_grad():
        outs_ref = [o.numpy() for o in ref(torch.tensor(x))]

    params = ours.init(jax.random.key(0), _nhwc(x))["params"]
    conv = convert_vssm_state_dict(_sd(ref))
    verify_tree_matches(conv, params)
    outs = ours.apply({"params": conv}, _nhwc(x))
    assert len(outs) == len(outs_ref) == 4
    for o, o_ref in zip(outs, outs_ref):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2),
                                   o_ref, rtol=2e-4, atol=2e-4)


def test_shallow_fusion_block_parity():
    torch = pytest.importorskip("torch")
    ref_fv = load_reference_module("fusion_vmamba")
    torch.manual_seed(3)
    ref = ref_fv.ShallowFusionBlock_v4(hidden_dim=32, d_state=4).eval()

    ours = ShallowFusionBlock(hidden_dim=32, d_state=4)

    rng = np.random.default_rng(3)
    x1 = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    x2 = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        r1, r2 = ref(torch.tensor(x1), torch.tensor(x2))

    variables = ours.init(jax.random.key(0), _nhwc(x1), _nhwc(x2))
    sd = {"shallow_mamba_fusion." + k: v for k, v in _sd(ref).items()}
    conv = convert_xfmamba_state_dict(sd)
    convp = conv["params"]["shallow_mamba_fusion"]
    convs = conv["batch_stats"]["shallow_mamba_fusion"]
    verify_tree_matches(convp, variables["params"])
    verify_tree_matches(convs, variables["batch_stats"])
    y1, y2 = ours.apply({"params": convp, "batch_stats": convs},
                        _nhwc(x1), _nhwc(x2))
    np.testing.assert_allclose(np.asarray(y1).transpose(0, 3, 1, 2),
                               r1.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y2).transpose(0, 3, 1, 2),
                               r2.numpy(), rtol=2e-4, atol=2e-4)


def test_cssf_layer_parity():
    torch = pytest.importorskip("torch")
    ref_fv = load_reference_module("fusion_vmamba")
    torch.manual_seed(4)
    ref = ref_fv.CSSFVSSLayer_v5(hidden_dim=32, depth=1, drop_path=[0.0],
                                 d_state=4).eval()

    ours = CSSFVSSLayer(hidden_dim=32, depth=1, drop_path=[0.0], d_state=4)

    rng = np.random.default_rng(4)
    x1 = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    x2 = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.tensor(x1), torch.tensor(x2)).numpy()

    params = ours.init(jax.random.key(0), _nhwc(x1), _nhwc(x2))["params"]
    sd = {"fusemamba." + k: v for k, v in _sd(ref).items()}
    conv = convert_xfmamba_state_dict(sd)["params"]["fusemamba"]
    verify_tree_matches(conv, params)
    y = ours.apply({"params": conv}, _nhwc(x1), _nhwc(x2))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), r,
                               rtol=2e-4, atol=2e-4)


def test_two_view_xfmamba_tiny_parity():
    torch = pytest.importorskip("torch")
    ref_net = load_reference_module("net_fusionmamba")
    torch.manual_seed(5)
    ref = ref_net.TwoViewXFMambaTop(in_channels=1, outputs=2,
                                    type="tiny").eval()

    ours = TwoViewXFMamba(outputs=2, model_type="tiny", hidden_dim=768,
                          d_state=16, drop_path_rate=0.1)

    rng = np.random.default_rng(5)
    x1 = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    x2 = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.tensor(x1), torch.tensor(x2)).numpy()

    variables = ours.init(jax.random.key(0), _nhwc(x1), _nhwc(x2))
    conv = convert_xfmamba_state_dict(_sd(ref))
    verify_tree_matches(conv["params"], variables["params"])
    verify_tree_matches(conv["batch_stats"], variables["batch_stats"])
    y = ours.apply(conv, _nhwc(x1), _nhwc(x2))
    np.testing.assert_allclose(np.asarray(y), r, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_two_view_xfmamba_small_flagship_parity():
    """Golden logit parity at the REAL flagship config: XFMamba-S
    (`net_fusionmamba.py:141` type='small' -> Backbone_VSSM depths
    [2,2,15,2], dims 96, mlp_ratio 2, v05_noz; fusion d_state 16) at
    224x224 — the exact geometry `bench.py` measures and the BASELINE
    north-star names."""
    torch = pytest.importorskip("torch")
    ref_net = load_reference_module("net_fusionmamba")
    torch.manual_seed(6)
    ref = ref_net.TwoViewXFMambaTop(in_channels=1, outputs=2,
                                    type="small").eval()

    from xfmamba_tpu.models.tops import two_view_xfmamba
    ours = two_view_xfmamba("small", outputs=2)

    rng = np.random.default_rng(6)
    x1 = rng.standard_normal((1, 1, 224, 224)).astype(np.float32)
    x2 = rng.standard_normal((1, 1, 224, 224)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.tensor(x1), torch.tensor(x2)).numpy()

    variables = ours.init(jax.random.key(0), _nhwc(x1), _nhwc(x2))
    conv = convert_xfmamba_state_dict(_sd(ref))
    verify_tree_matches(conv["params"], variables["params"])
    verify_tree_matches(conv["batch_stats"], variables["batch_stats"])
    y = ours.apply(conv, _nhwc(x1), _nhwc(x2))
    np.testing.assert_allclose(np.asarray(y), r, rtol=2e-4, atol=2e-4)
