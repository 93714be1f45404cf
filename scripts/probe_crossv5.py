"""Decompose CrossSS2Dv5 (stage-3, N=16) time: projections vs nk scan
kernel vs epilogue. bs 32 (xcat batch 96), bf16, one process."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from scripts.chain_timer import chain_time  # noqa: E402
from xfmamba_tpu.models.fusion import CrossSS2Dv5, _project_kdirs  # noqa: E402
from xfmamba_tpu.ops.vss_block_pallas import nk_scan_from_projs  # noqa: E402
from xfmamba_tpu.ops.vss_block_pallas_v2 import (  # noqa: E402
    nk_scan_from_projs_v2)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    B, H, W, d = 32, 7, 7, 768
    dt = jnp.bfloat16
    d_inner, K, N, R = 1536, 4, 16, 48

    key = jax.random.key(0)
    z = jax.random.normal(key, (B, H, W, d), dt)
    op = CrossSS2Dv5(d_model=d, d_state=N, dtype=dt)
    v = op.init(jax.random.key(1), z, z)
    t = chain_time(lambda a, b: op.apply(v, a, b), (z, z), k_long=16)
    print(f"CrossSS2Dv5 full:        {t*1e3:7.3f} ms", flush=True)

    p = v["params"]
    xcat = jax.random.normal(key, (3 * B, H, W, d_inner), dt)

    def proj_only(xc):
        dts_c, Bs_c, Cs_c = _project_kdirs(
            xc, p["x_proj_weight"], p["dt_projs_weight"], R, N)
        return dts_c.sum() + Bs_c.sum() + Cs_c.sum()

    t = chain_time(proj_only, (xcat,), k_long=16)
    print(f"_project_kdirs:          {t*1e3:7.3f} ms", flush=True)

    dts_c, Bs_c, Cs_c = _project_kdirs(
        xcat, p["x_proj_weight"], p["dt_projs_weight"], R, N)
    Cs_f = Cs_c[:B]
    Cs_sub = jnp.concatenate([Cs_f, Cs_f, Cs_f], axis=0)
    A = -jnp.exp(p["A_logs"].astype(jnp.float32)).reshape(K, d_inner, N)
    Dmat = p["Ds"].astype(jnp.float32).reshape(K, d_inner)
    bias = p["dt_projs_bias"].astype(jnp.float32)

    from xfmamba_tpu.ops.ablations.nk_scan_wide import nk_scan_call_v3

    def v3(xc, dts_c, Bs_c, Cs_sub, A, Dmat, bias, scan_mode="cross2d"):
        Bx, Hx, Wx, Dx = xc.shape
        Lx = Hx * Wx
        kinds = ("row_f", "col_f", "row_r", "col_r")
        A_p = jnp.swapaxes(A, 1, 2).reshape(K * N, d_inner)
        return nk_scan_call_v3(
            xc.reshape(Bx, Lx, Dx), dts_c.reshape(Bx, Lx, K * Dx),
            Bs_c.reshape(Bx, Lx, K * N), Cs_sub.reshape(Bx, Lx, K * N),
            A_p, Dmat, bias, Hx, Wx, kinds, group=8)

    for name, fn in (("nk_scan v1", nk_scan_from_projs),
                     ("nk_scan v2", nk_scan_from_projs_v2),
                     ("nk_scan v3", v3)):
        try:
            t = chain_time(
                lambda xc: fn(xc, dts_c, Bs_c, Cs_sub, A, Dmat, bias,
                              scan_mode="cross2d"),
                (xcat,), k_long=16)
            print(f"{name}:              {t*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
