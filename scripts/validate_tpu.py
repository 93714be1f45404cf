"""On-device validation: fused (v2 kernels) vs composable paths.

The interpret-mode tests pin kernel math on CPU; this script checks the
REAL compiled kernels on the TPU:
 1. XFMamba-S two-view forward, FUSED_INFERENCE on vs off (bf16) at 224².
 2. Fused training step vs composable: loss + per-leaf gradient parity at
    a small-but-multi-stage geometry.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_tpu.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


def check_inference():
    from xfmamba_tpu.models.tops import two_view_xfmamba
    from xfmamba_tpu.ops import vss_block_pallas as v1
    from xfmamba_tpu.ops import vss_block_pallas_v2 as v2

    model = two_view_xfmamba("small", outputs=2, dtype=jnp.bfloat16)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (8, 224, 224, 1),
                           jnp.bfloat16)
    x2 = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 1),
                           jnp.bfloat16)
    variables = model.init(jax.random.key(0), x1, x2)

    @jax.jit
    def fwd(v, a, b):
        return model.apply(v, a, b)

    y_fused = np.asarray(fwd(variables, x1, x2))
    v1.FUSED_INFERENCE = False

    @jax.jit
    def fwd_comp(v, a, b):
        return model.apply(v, a, b)

    y_comp = np.asarray(fwd_comp(variables, x1, x2))
    v1.FUSED_INFERENCE = True
    e = rel_err(y_fused, y_comp)
    print(f"inference fused-vs-composable rel err: {e:.2e} "
          f"({'OK' if e < 2e-2 else 'FAIL'})", flush=True)
    return e < 2e-2


def check_train_grads():
    from xfmamba_tpu.models.vssm import VSSM
    from xfmamba_tpu.ops import vss_block_pallas_v2 as v2

    model = VSSM(depths=(1, 1), dims=32, num_classes=2, ssm_d_state=1,
                 ssm_ratio=2.0, ssm_conv_bias=False, forward_type="v05_noz",
                 mlp_ratio=4.0, drop_path_rate=0.0,
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

    lf, gf = jax.jit(jax.value_and_grad(loss_fn))(params)
    v2.FUSED_TRAIN = False
    lc, gc = jax.jit(jax.value_and_grad(loss_fn))(params)
    v2.FUSED_TRAIN = True
    errs = jax.tree_util.tree_map(rel_err, gf, gc)
    worst = max(jax.tree_util.tree_leaves(errs))
    print(f"train loss fused={float(lf):.6f} comp={float(lc):.6f} "
          f"worst grad rel err={worst:.2e} "
          f"({'OK' if worst < 5e-2 and abs(float(lf) - float(lc)) < 1e-3 else 'FAIL'})",
          flush=True)
    if worst >= 5e-2:
        flat = jax.traverse_util.flatten_dict(errs) \
            if hasattr(jax, "traverse_util") else None
        from flax.traverse_util import flatten_dict
        for k, v in sorted(flatten_dict(errs).items(),
                           key=lambda kv: -kv[1])[:8]:
            print("  ", "/".join(k), f"{v:.2e}")
    return worst < 5e-2 and abs(float(lf) - float(lc)) < 1e-3


if __name__ == "__main__":
    ok1 = check_inference()
    ok2 = check_train_grads()
    sys.exit(0 if (ok1 and ok2) else 1)
