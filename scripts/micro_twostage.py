#!/usr/bin/env python
"""Micro-benchmark: two-stage (Cooley-Tukey) factored DFT matmuls.

The roofline profile puts the chain's fwd+inv DFT pair at ~4.0 ms
(181.9 GFLOP at ~45 TFLOP/s — 68% of the bf16x3 ceiling): the dense
(T, 2M) matmul is the chain's compute floor. A radix factorization
T = N1 x N2 cuts DFT FLOPs from O(T^2) to O(T(N1+N2)) per trace; the
module docstring of ops/mxufft.py records a 32x32 attempt that LOST to
the dense matmul (tiny tiles waste the 128x128 systolic array). This
re-tests with MXU-friendly major factors: stage 1 contracts length N1
(256 or 512 — full MXU tiles), stage 2 contracts the tiny N2 where the
matmul is bandwidth-bound anyway.

Forward r2c, x real (B, T) -> (2, B, M), M = T/2+1, k = k1 + N1*k2:
  S1[b, k1, t2] = sum_t1 x[b, t1*N2 + t2] * W_N1^{t1 k1}   (real matmul,
      contract the MAJOR reshaped axis: einsum 'btc,tk->bkc')
  Y = S1 * W_N^{k1 t2}                                      (twiddle)
  X[b, k1 + N1 k2] = sum_t2 Y[b, k1, t2] * W_N2^{t2 k2}     (tiny matmul)
Only k2 < ceil(M/N1)+1 columns of stage 2 are needed for the rfft half.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_twostage.py
Prints one JSON line. Results recorded in ops/mxufft.py's docstring.
"""

import json
import sys
import time
from functools import lru_cache, partial

import numpy as np

sys.path.insert(0, "/root/repo")

B, T = 43264, 1024
M = T // 2 + 1
PREC_HIGH = None  # set in main


@lru_cache(maxsize=None)
def _stage_mats(n1: int, n2: int):
    """Host-side factor matrices for T = n1*n2.

    Returns (f1 [n1, 2n1] fused cos|sin, tw [2, n1, n2] twiddles,
    f2r/f2i [n2, n2k] stage-2 DFT, n2k) where n2k columns cover every
    k = k1 + n1*k2 < M.
    """
    n = n1 * n2
    t1 = np.arange(n1)
    k1 = np.arange(n1)
    a1 = np.outer(t1, k1) * (2.0 * np.pi / n1)
    f1 = np.concatenate(
        [np.cos(a1), -np.sin(a1)], axis=1
    ).astype(np.float32)  # x @ f1 -> [real | imag]

    t2 = np.arange(n2)
    atw = np.outer(k1, t2) * (2.0 * np.pi / n)
    tw = np.stack([np.cos(atw), -np.sin(atw)]).astype(np.float32)

    n2k = min((M - 1) // n1 + 1, n2)
    k2 = np.arange(n2k)
    a2 = np.outer(t2, k2) * (2.0 * np.pi / n2)
    f2r = np.cos(a2).astype(np.float32)
    f2i = (-np.sin(a2)).astype(np.float32)
    return f1, tw, f2r, f2i, n2k


def make_twostage(jnp, n1: int, n2: int, prec):
    f1_h, tw_h, f2r_h, f2i_h, n2k = _stage_mats(n1, n2)
    f1 = jnp.asarray(f1_h)
    twr = jnp.asarray(tw_h[0])
    twi = jnp.asarray(tw_h[1])
    f2r = jnp.asarray(f2r_h)
    f2i = jnp.asarray(f2i_h)

    def fwd(x):
        n = n1 * n2
        x3 = x.reshape(x.shape[0], n1, n2)
        # stage 1: contract the major axis t1 (length n1) on the MXU
        s1 = jnp.einsum("btc,tk->bkc", x3, f1, precision=prec)
        s1r, s1i = s1[:, :n1, :], s1[:, n1:, :]
        # twiddle W_N^{k1 t2}
        yr = s1r * twr - s1i * twi
        yi = s1r * twi + s1i * twr
        # stage 2: contract the tiny minor axis t2
        zr = (
            jnp.einsum("bkc,cj->bkj", yr, f2r, precision=prec)
            - jnp.einsum("bkc,cj->bkj", yi, f2i, precision=prec)
        )
        zi = (
            jnp.einsum("bkc,cj->bkj", yr, f2i, precision=prec)
            + jnp.einsum("bkc,cj->bkj", yi, f2r, precision=prec)
        )
        # X[k1 + n1*k2] = Z[k1, k2]: transpose k2 major, slice the half
        xr = zr.transpose(0, 2, 1).reshape(x.shape[0], n1 * n2k)[:, :M]
        xi = zi.transpose(0, 2, 1).reshape(x.shape[0], n1 * n2k)[:, :M]
        return jnp.stack([xr, xi])

    return fwd


def main():
    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.ops.mxufft import rfft_ri
    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    prec = jax.lax.Precision.HIGH

    rng = np.random.default_rng(0)
    xh = rng.normal(size=(B, T)).astype(np.float32)
    x = jnp.asarray(xh)
    jax.block_until_ready(x)

    _sum = jax.jit(lambda y: jnp.sum(jnp.ravel(y)[:128]))
    out = {"shape": [B, T]}

    # numeric check vs numpy on a small slice
    ref = np.fft.rfft(xh[:64])

    def timeit(label, fn, gflop, n=60):
        f = jax.jit(fn)
        r = f(x)
        got = np.asarray(jax.device_get(r))[:, :64]
        err = np.max(np.abs((got[0] + 1j * got[1]) - ref)) / np.max(np.abs(ref))
        float(_sum(r))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _i in range(n):
                r = f(x)
            float(_sum(r))
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        out[label] = {
            "ms": round(best * 1e3, 3),
            "tflops": round(gflop / best / 1e3, 1),
            "relerr": float(f"{err:.2e}"),
        }
        print(f"  {label}: {out[label]}", file=sys.stderr, flush=True)

    g_dense = 2 * B * T * 2 * M / 1e9
    timeit("dense_fused", lambda a: rfft_ri(a), g_dense)

    for n1, n2 in ((256, 4), (128, 8), (512, 2), (64, 16)):
        _, _, _, _, n2k = _stage_mats(n1, n2)
        g = (
            2 * B * T * 2 * n1          # stage 1
            + 6 * B * n1 * n2           # twiddle
            + 4 * 2 * B * T * n2k       # stage 2 (4 real einsums)
        ) / 1e9
        timeit(f"twostage_{n1}x{n2}", make_twostage(jnp, n1, n2, prec), g)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
