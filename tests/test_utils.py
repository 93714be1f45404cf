"""Tests for xfmamba_tpu.utils (flops / profiling / saliency) and mixup."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.models.tops import TwoViewXFMamba
from xfmamba_tpu.train.loop import mixup
from xfmamba_tpu.utils.flops import (
    count_params, flops_selective_scan_fn, model_flops, xla_cost_analysis)
from xfmamba_tpu.utils.profiling import (
    do_bench, format_timing_report, timing_stats)
from xfmamba_tpu.utils.saliency import (
    grad_cam_two_view, input_saliency, overlay)


def _tiny_model():
    return TwoViewXFMamba(
        outputs=2, model_type="tiny", hidden_dim=128, d_state=4,
        backbone_overrides=dict(depths=(1, 1, 1, 1), dims=16),
    ), (jnp.ones((1, 32, 32, 1)), jnp.ones((1, 32, 32, 1)))


def _init_vars(model, x1, x2):
    """Init and keep the inference collections (params + batch_stats)."""
    v = model.init(jax.random.key(0), x1, x2)
    return {k: v[k] for k in ("params", "batch_stats") if k in v}


def test_flops_formula():
    # 9*B*L*D*N + BDL (D skip)
    assert flops_selective_scan_fn(2, 10, 8, 4, with_D=True) == \
        9 * 2 * 10 * 8 * 4 + 2 * 8 * 10
    assert flops_selective_scan_fn(1, 5, 3, 2, with_D=False, with_Z=True) == \
        9 * 5 * 3 * 2 + 3 * 5


def test_xla_cost_analysis_matmul():
    a = jnp.ones((64, 64))
    ca = xla_cost_analysis(lambda x: x @ x, a)
    # 2*64^3 flops expected (allow XLA accounting slack)
    assert ca.get("flops", 0) >= 64 ** 3


def test_count_params():
    tree = {"a": np.zeros((2, 3)), "b": {"c": np.zeros((4,))}}
    assert count_params(tree) == 10


@pytest.mark.slow
def test_model_flops_and_params():
    model, (x1, x2) = _tiny_model()
    variables = _init_vars(model, x1, x2)
    out = model_flops(model, variables, x1, x2)
    assert out["flops"] > 0
    assert out["params"] > 1000


def test_do_bench_and_timing_stats():
    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.ones((128, 128))
    res = do_bench(f, x, warmup=1, iters=3)
    assert res["median_s"] > 0 and res["min_s"] <= res["median_s"]

    stats = timing_stats([0.01, 0.02, 0.03], batch_size=4)
    assert abs(stats["mean_ms"] - 20.0) < 1e-6
    assert abs(stats["fps"] - 4 / 0.02) < 1e-6
    report = format_timing_report(stats)
    assert "FPS" in report and "20.000 ms" in report


@pytest.mark.slow
def test_grad_cam_two_view():
    model, (x1, x2) = _tiny_model()
    variables = _init_vars(model, x1, x2)
    cam_a, cam_b = grad_cam_two_view(model, variables, x1, x2, class_idx=1)
    assert cam_a.shape == (1, 32, 32) and cam_b.shape == (1, 32, 32)
    for cam in (cam_a, cam_b):
        arr = np.asarray(cam)
        assert np.isfinite(arr).all()
        assert arr.min() >= 0.0 and arr.max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_input_saliency_and_overlay():
    model, (x1, x2) = _tiny_model()
    variables = _init_vars(model, x1, x2)

    def apply_fn(a, b):
        return model.apply(variables, a, b)

    s1, s2 = input_saliency(apply_fn, x1, x2, class_idx=0)
    assert s1.shape == (1, 32, 32) and s2.shape == (1, 32, 32)
    assert np.isfinite(np.asarray(s1)).all()

    img = jnp.zeros((32, 32))
    cam = jnp.ones((32, 32))
    rgb = overlay(img, cam, alpha=0.5)
    assert rgb.shape == (32, 32, 3)
    assert float(rgb[..., 0].max()) > 0  # red highlight applied


def test_mixup():
    rng = jax.random.key(0)
    x = jnp.arange(8.0).reshape(4, 2)
    y = jnp.asarray([0, 1, 0, 1])
    mx, my, lam = mixup(rng, x, y, alpha=1.0, num_classes=2)
    assert mx.shape == x.shape and my.shape == (4, 2)
    assert 0.0 <= float(lam) <= 1.0
    np.testing.assert_allclose(np.asarray(my.sum(-1)), np.ones(4), rtol=1e-6)


def test_misc_utils(tmp_path, capsys):
    from xfmamba_tpu.utils.misc import (get_save_path, set_random_seeds,
                                        show_config)
    key = set_random_seeds(7)
    assert key is not None
    show_config({"lr": 1e-4, "dataset": "mura"})
    out = capsys.readouterr().out
    assert "lr" in out and "mura" in out
    p = get_save_path(str(tmp_path), "twoviewxfmamba", "mura", tag="t1")
    assert os.path.isdir(p)
    assert "mura_twoviewxfmamba_" in p and p.endswith("_t1")
