"""Stage-2/3 group-size re-measure (companion to ab_stage0_group.py)."""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from scripts.ab_stage0_group import run_geoms  # noqa: E402

GEOMS = [
    ("stage2", 128, 14, 14, 384, 768, 24, 15, (4, 8)),
    ("stage3", 128, 7, 7, 768, 1536, 48, 2, (8, 4)),
]

if __name__ == "__main__":
    run_geoms(GEOMS)
