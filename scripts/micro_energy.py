#!/usr/bin/env python
"""Micro-bench the pieces of the band-energy computation."""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

_PREC = jax.lax.Precision.HIGH
N, M, B, K = 40000, 1025, 25, 249

rng = np.random.default_rng(0)
power = jnp.asarray(rng.normal(size=(N, M)).astype(np.float32) ** 2)
w2 = jnp.asarray(rng.normal(size=(M, B)).astype(np.float32) ** 2)
xh = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
mh = jnp.asarray(rng.normal(size=(B, K, K)).astype(np.float32))

_sum = jax.jit(jnp.sum)
bar = lambda x: float(_sum(x))


def timeit(fn, n=5):
    fn()
    best = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best.append(time.perf_counter() - t0)
    return min(best) * 1e3


@jax.jit
def full(power, w2):
    return jnp.dot(power, w2, precision=_PREC)


@jax.jit
def head_einsum(xh, mh):
    hv = jnp.einsum("nt,bkt->nbk", xh, mh, precision=_PREC)
    return jnp.sum(hv * hv, axis=-1)


@jax.jit
def head_matmul(xh, mh):
    # explicit reshape: (N, t) @ (t, B*k)
    m2 = mh.transpose(2, 0, 1).reshape(K, B * K)
    hv = jnp.dot(xh, m2, precision=_PREC).reshape(N, B, K)
    return jnp.sum(hv * hv, axis=-1)


@partial(jax.jit, static_argnames=())
def head_bf16(xh, mh):
    m2 = mh.transpose(2, 0, 1).reshape(K, B * K)
    hv = jnp.dot(xh, m2, precision=jax.lax.Precision.DEFAULT).reshape(N, B, K)
    return jnp.sum(hv * hv, axis=-1)


print("e_full matmul:", timeit(lambda: bar(full(power, w2))), "ms", file=sys.stderr)
print("head einsum HIGH:", timeit(lambda: bar(head_einsum(xh, mh))), "ms", file=sys.stderr)
print("head matmul HIGH:", timeit(lambda: bar(head_matmul(xh, mh))), "ms", file=sys.stderr)
print("head matmul DEFAULT:", timeit(lambda: bar(head_bf16(xh, mh))), "ms", file=sys.stderr)
