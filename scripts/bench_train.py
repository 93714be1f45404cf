"""Training-step throughput (XFMamba-S two-view, bs 16) on the real TPU."""
import sys, time, functools
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo/scripts")

from xfmamba_tpu.models.tops import two_view_xfmamba
from xfmamba_tpu.train.config import TrainConfig
from xfmamba_tpu.train.loop import (init_train_state, make_optimizer,
                                    make_train_step)

BS = 16
model = two_view_xfmamba("small", outputs=2, dtype=jnp.bfloat16,
                         use_checkpoint=False)
cfg = TrainConfig(lr=1e-4)
opt = make_optimizer(cfg)
x1 = jnp.ones((BS, 224, 224, 1), jnp.bfloat16)
x2 = jnp.ones((BS, 224, 224, 1), jnp.bfloat16)
labels = jnp.zeros((BS,), jnp.int32)
state = init_train_state(model, opt, jax.random.key(0), (x1, x2))
train_step, _ = make_train_step(model, opt, multilabel=False, donate=False)
batch = {"image1": x1, "image2": x2, "label": labels}
lr = jnp.asarray(1e-4)
rng = jax.random.key(1)

# chained timing (remote dispatch overhead cancellation)
def run_k(k):
    s = state
    t0 = None
    for i in range(k):
        s, m = train_step(s, batch, rng, lr)
    return float(m["loss"])   # scalar fetch = real sync on the remote path

run_k(1)
t0 = time.perf_counter(); run_k(1); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); run_k(6); t6 = time.perf_counter() - t0
per = (t6 - t1) / 5
print(f"train step: {per*1e3:.1f} ms  ({BS/per:.1f} img/s)")
