"""Bracket the train step: fwd-only (train mode), value_and_grad only,
optimizer-only, full step.  bs 16 XFMamba-S two-view."""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from chain_timer import chain_time
from xfmamba_tpu.models.tops import two_view_xfmamba
from xfmamba_tpu.train.config import TrainConfig
from xfmamba_tpu.train.loop import (cross_entropy_loss, init_train_state,
                                    make_optimizer, make_train_step)

BS = 16
model = two_view_xfmamba("small", outputs=2, dtype=jnp.bfloat16,
                         use_checkpoint=False)
cfg = TrainConfig(lr=1e-4)
opt = make_optimizer(cfg)
x1 = jnp.ones((BS, 224, 224, 1), jnp.bfloat16)
x2 = jnp.ones((BS, 224, 224, 1), jnp.bfloat16)
labels = jnp.zeros((BS,), jnp.int32)
state = init_train_state(model, opt, jax.random.key(0), (x1, x2))
RNGS = {"dropout": jax.random.key(1)}

def variables(p):
    v = {"params": p}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v

MUT = ["batch_stats"] if state.batch_stats else False

# 1. fwd only, train mode
def fwd(p, a, b):
    out = model.apply(variables(p), a, b, deterministic=False,
                      rngs=RNGS, mutable=MUT)
    logits = out[0] if MUT else out
    return logits.astype(jnp.float32).sum()
t = chain_time(lambda a, b: fwd(state.params, a, b), [x1, x2])
print(f"fwd (train mode): {t*1e3:.2f} ms", flush=True)

# 1b. fwd only, eval mode (the fused inference stage path, for contrast)
def fwd_eval(p, a, b):
    return model.apply(variables(p), a, b,
                       deterministic=True).astype(jnp.float32).sum()
t = chain_time(lambda a, b: fwd_eval(state.params, a, b), [x1, x2])
print(f"fwd (eval mode): {t*1e3:.2f} ms", flush=True)

# 2. value_and_grad only.  NB: consume EVERY grad leaf in the timed
# scalar — an earlier version returned only the loss and XLA DCE'd the
# whole backward (measured 23.9 ms == fwd-only; bogus).
def loss_fn(p, a, b):
    out = model.apply(variables(p), a, b, deterministic=False,
                      rngs=RNGS, mutable=MUT)
    logits = out[0] if MUT else out
    return cross_entropy_loss(logits, labels)
vg = jax.value_and_grad(loss_fn)
def vg_all(a, b):
    loss, g = vg(state.params, a, b)
    return loss + jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + leaf.astype(jnp.float32).sum(), g, 0.0)
t = chain_time(vg_all, [x1, x2])
print(f"value_and_grad: {t*1e3:.2f} ms", flush=True)

# 3. optimizer update alone (grads = params-shaped ones)
grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), state.params)
def opt_step(g, o, p):
    updates, o2 = opt.update(g, o, p)
    p2 = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
    return jax.tree_util.tree_leaves(p2)[0].astype(jnp.float32).sum()
t = chain_time(lambda g: opt_step(g, state.opt_state, state.params), [grads])
print(f"optimizer update: {t*1e3:.2f} ms", flush=True)

# 4. full train step (reference)
train_step, _ = make_train_step(model, opt, multilabel=False, donate=False)
batch = {"image1": x1, "image2": x2, "label": labels}
lr = jnp.asarray(1e-4)
rng = jax.random.key(1)
def run_k(k):
    s = state
    for i in range(k):
        s, m = train_step(s, batch, rng, lr)
    return float(m["loss"])
run_k(1)
t0 = time.perf_counter(); run_k(1); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); run_k(6); t6 = time.perf_counter() - t0
per = (t6 - t1) / 5
print(f"full train step: {per*1e3:.2f} ms ({BS/per:.1f} img/s)", flush=True)
