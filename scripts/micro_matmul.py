#!/usr/bin/env python
"""Micro-benchmark: the DFT matmul at every precision lowering.

The roofline profile (scripts/profile_roofline.py) showed the forward DFT
matmul pair running at ~15 TFLOP/s — far under the ~65 TFLOP/s bf16x3
ceiling — making it the dominant chain phase. This isolates the matmul to
find which lowering actually achieves the ceiling on this runtime:

* jnp.dot at DEFAULT / HIGH / HIGHEST precision;
* explicit bf16x3 decomposition (hi/lo split, 3 bf16 dots) — the same
  trick ops/pallas_rl._mm3 uses inside pallas kernels;
* plain bf16 operands;
* fused cos+sin as ONE (t, 2m) matmul vs two separate (t, m) dots;
* an HBM streaming copy, to calibrate achievable bandwidth.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_matmul.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()

    B, T, M = 43264, 1024, 513  # the bench-shape forward DFT
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(T, M)).astype(np.float32))
    cs = jnp.asarray(rng.normal(size=(T, 2 * M)).astype(np.float32))
    cs_pad = jnp.asarray(rng.normal(size=(T, 1024)).astype(np.float32))
    jax.block_until_ready(x)

    _sum = jax.jit(lambda y: jnp.sum(jnp.ravel(y)[:128]))
    out = {}

    def timeit(label, fn, *args, gflop, n=60):
        f = jax.jit(fn)
        r = f(*args)
        float(_sum(r))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _i in range(n):
                r = f(*args)
            float(_sum(r))
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        out[label] = {
            "ms": round(best * 1e3, 3),
            "tflops": round(gflop / best / 1e3, 1),
        }
        # incremental: survive an outer timeout with partial results
        print(f"  {label}: {out[label]}", file=sys.stderr, flush=True)

    g1 = 2 * B * T * M / 1e9       # one (B,T)@(T,M)
    g2 = 2 * B * T * 2 * M / 1e9   # one (B,T)@(T,2M)

    for prec in ("default", "high", "highest"):
        p = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[prec]
        timeit(f"dot_{prec}", lambda a, b, p=p: jnp.dot(a, b, precision=p),
               x, c, gflop=g1)

    # two separate dots at HIGH (the current rfft_ri structure)
    timeit(
        "two_dots_high",
        lambda a, b: jnp.stack([
            jnp.dot(a, b, precision=jax.lax.Precision.HIGH),
            jnp.dot(a, b[:, ::-1], precision=jax.lax.Precision.HIGH),
        ]),
        x, c, gflop=2 * g1,
    )
    # one fused (T, 2M) dot at HIGH
    timeit("one_dot_2m_high",
           lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGH),
           x, cs, gflop=g2)
    # lane-aligned 2M=1024 at HIGH
    timeit("one_dot_1024_high",
           lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGH),
           x, cs_pad, gflop=2 * B * T * 1024 / 1e9)

    # explicit bf16x3: a = ah + al, b = bh + bl; a@b ~= ah@bh + ah@bl + al@bh
    def mm3(a, b):
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = partial(jnp.dot, preferred_element_type=jnp.float32)
        return d(ah, bh) + d(ah, bl) + d(al, bh)

    timeit("mm3_bf16x3", mm3, x, cs, gflop=3 * g2)
    timeit("bf16_plain",
           lambda a, b: jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32),
           x, cs, gflop=g2)

    # HBM streaming calibration: read+write 177 MB
    timeit("copy_stream", lambda a: a * 1.0000001 + 1.0, x, gflop=0)
    bytes_gb = x.size * 4 * 2 / 1e9
    out["copy_stream"]["gbps"] = round(
        bytes_gb / (out["copy_stream"]["ms"] / 1e3), 1
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
