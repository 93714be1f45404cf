"""Property tests for the megakernel's two-level scan decomposition.

`_scan_direction` is pure jnp (usable outside Pallas), so every traversal
kind can be checked directly against a sequential recurrence oracle across
geometries — including non-square, non-power-of-two, W<8, and G-stacked
images (the oracle scans each image independently; the kernel must not leak
state across image boundaries).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfmamba_tpu.ops.vss_block_pallas import _DIR_KINDS, _scan_direction

_scan_j = jax.jit(_scan_direction, static_argnums=(2, 3, 4, 5))


def _oracle(a, b, H, W, G, kind):
    L = H * W
    out = np.zeros_like(b)
    for g in range(G):
        A = a[g * L:(g + 1) * L].reshape(H, W, -1)
        B = b[g * L:(g + 1) * L].reshape(H, W, -1)
        if kind.startswith("col"):
            A, B = A.transpose(1, 0, 2), B.transpose(1, 0, 2)
        Af, Bf = A.reshape(L, -1), B.reshape(L, -1)
        order = range(L) if kind.endswith("_f") else range(L - 1, -1, -1)
        s = np.zeros(Af.shape[1])
        o = np.zeros_like(Bf)
        for t in order:
            s = Af[t] * s + Bf[t]
            o[t] = s
        if kind.startswith("col"):
            o = o.reshape(W, H, -1).transpose(1, 0, 2).reshape(L, -1)
        out[g * L:(g + 1) * L] = o
    return out


@pytest.mark.parametrize("H,W,G", [
    (2, 3, 1), (3, 2, 2), (7, 7, 4), (6, 10, 2), (14, 14, 2), (5, 13, 3),
    (2, 2, 8), (9, 4, 1),
])
@pytest.mark.parametrize("kind", _DIR_KINDS + ("flat_f", "flat_r"))
def test_scan_direction_matches_sequential(H, W, G, kind):
    rng = np.random.default_rng(hash((H, W, G, kind)) % 2 ** 31)
    L, C = H * W, 5
    a = rng.uniform(0.1, 1.0, (G * L, C)).astype(np.float32)
    b = rng.normal(size=(G * L, C)).astype(np.float32)
    h = np.asarray(_scan_j(jnp.asarray(a), jnp.asarray(b), H, W, G, kind))
    want = _oracle(a, b, H, W, G,
                   {"flat_f": "row_f", "flat_r": "row_r"}.get(kind, kind))
    np.testing.assert_allclose(h, want, rtol=2e-5, atol=2e-5)
