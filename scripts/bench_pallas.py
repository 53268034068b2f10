"""Microbenchmark: Pallas kernels vs fused XLA at flagship MTN shapes.

Decides where the kernels are dispatched by default (docs/BENCH.md
"Pallas kernels" table; VERDICT r1 weak #2 asked for pallas-on vs
pallas-off data at the shapes that matter).

Methodology: each op is chained through a jitted ``lax.scan`` of ITERS
iterations (output feeds the next input) so one device round trip
amortizes over many executions — on this relay transport a single op is
unmeasurable. Timings force a device-to-host fetch (block_until_ready
does not imply completion here, CLAUDE.md).

Usage: python scripts/bench_pallas.py [iters]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

ITERS = 100


def _time_chained(fn, x0, *consts):
    """sec/op for y = fn(y, *consts) chained ITERS times inside one jit."""
    import jax

    @jax.jit
    def run(x0, consts):
        def body(c, _):
            return fn(c, *consts), None
        y, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return y

    _ = np.asarray(run(x0, consts))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = np.asarray(run(x0, consts))
        best = min(best, time.time() - t0)
    return best / ITERS


def main(iters: int = ITERS):
    global ITERS
    ITERS = iters
    import jax
    import jax.numpy as jnp
    from mtn_tpu.ops import pallas_attention as pa
    from mtn_tpu.ops import pallas_ffn as pf
    from mtn_tpu.ops.attention import sdpa_xla

    rows = []
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # ---- attention: train/precompute shapes (B=32, H=8, D=64) ----------
    for Lq, Lk in [(32, 32), (32, 128), (128, 128)]:
        B, H, D = 32, 8, 64
        q = jnp.asarray(rng.standard_normal((B, H, Lq, D)), dt)
        k = jnp.asarray(rng.standard_normal((B, H, Lk, D)), dt)
        v = jnp.asarray(rng.standard_normal((B, H, Lk, D)), dt)
        mask = jnp.asarray(rng.random((B, 1, Lq, Lk)) > 0.1)
        mask_b = pa._canon_mask(mask, B, Lq, Lk)

        t_xla = _time_chained(lambda y, k, v, m: sdpa_xla(y, k, v, m),
                              q, k, v, mask)
        t_pal = _time_chained(lambda y, k, v, mb: pa._flash(y, k, v, mb),
                              q, k, v, mask_b)
        rows.append(dict(op="attn_fwd", Lq=Lq, Lk=Lk,
                         xla_us=round(t_xla * 1e6, 1),
                         pallas_us=round(t_pal * 1e6, 1),
                         speedup=round(t_xla / t_pal, 2)))

        # fwd+bwd (training): grad wrt q/k/v, chained through q
        def g_xla(y, k, v, m):
            f = lambda q_: jnp.sum(sdpa_xla(q_, k, v, m) ** 2)
            return jax.grad(f)(y)

        def g_pal(y, k, v, mb):
            f = lambda q_: jnp.sum(pa._flash(q_, k, v, mb) ** 2)
            return jax.grad(f)(y)

        t_xla_g = _time_chained(g_xla, q, k, v, mask)
        t_pal_g = _time_chained(g_pal, q, k, v, mask_b)
        rows.append(dict(op="attn_grad", Lq=Lq, Lk=Lk,
                         xla_us=round(t_xla_g * 1e6, 1),
                         pallas_us=round(t_pal_g * 1e6, 1),
                         speedup=round(t_xla_g / t_pal_g, 2)))

    # ---- FFN: train rows (32 turns x 33 ans), decode rows (160) ---------
    D, F = 512, 2048
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.02, dt)
    b1 = jnp.zeros((F,), dt)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.02, dt)
    b2 = jnp.zeros((D,), dt)
    for n_rows in (160, 1056, 4096):
        x = jnp.asarray(rng.standard_normal((n_rows, D)), dt)
        t_xla = _time_chained(pf._xla_ffn, x, w1, b1, w2, b2)
        t_pal = _time_chained(pf._fused, x, w1, b1, w2, b2)
        rows.append(dict(op="ffn_fwd", rows=n_rows,
                         xla_us=round(t_xla * 1e6, 1),
                         pallas_us=round(t_pal * 1e6, 1),
                         speedup=round(t_xla / t_pal, 2)))

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
