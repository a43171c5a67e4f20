#!/usr/bin/env python
"""Micro-bench the RL scan skeleton (pad + banded matrices + crop) and its
pieces, with a multi-dispatch single-barrier pattern to subtract RTT."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

from thz_image_explorer_tpu.ops import deconvolution as dec

X, Y, B = 200, 200, 25
PRM, PCM = 23, 28
KR, KC = 47, 57

rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, X, Y)).astype(np.float32))
pxs = jnp.asarray(rng.normal(size=(B, KR)).astype(np.float32))
pys = jnp.asarray(rng.normal(size=(B, KC)).astype(np.float32))
pr = jnp.asarray(np.full(B, 20, np.int32))
pc = jnp.asarray(np.full(B, 25, np.int32))
ni = jnp.asarray(np.zeros(B, np.int32))
ni_real = jnp.asarray(np.array([423,353,302,266,228,194,159,122,90,69,51,36,25,17,11,7,4,4,3,3,3,3,2,1,1], np.int32))

_sum = jax.jit(jnp.sum)
bar = lambda x: float(_sum(x))


def devtime(fn, k=8):
    """Dispatch k times back-to-back, barrier once; subtract 1-dispatch RTT."""
    fn()  # compile
    bar(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn()
    bar(out)
    total = time.perf_counter() - t0
    t1 = time.perf_counter()
    bar(fn())
    single = time.perf_counter() - t1
    # per-dispatch device time ~ (total - single) / (k - 1)
    return (total - single) / (k - 1) * 1e3


@jax.jit
def skeleton(imgs, pxs, pys, ni, pr, pc):
    def body(_c, xs):
        img, px, py, n, r, c = xs
        padded = dec._dynamic_reflect_pad(img, r, c, PRM, PCM)
        h2, w2 = padded.shape
        R = dec._banded_matrix(px, h2, px.shape[0])
        C = dec._banded_matrix(py, w2, py.shape[0])
        mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGH)
        u = dec._richardson_lucy(padded, n,
                                 lambda a: mm(mm(R, a), C.T),
                                 lambda a: mm(mm(R.T, a), C))
        u = u[PRM:PRM + X, PCM:PCM + Y]
        return _c, jnp.sqrt(jnp.maximum(u, 0.0) / img)
    _, g = jax.lax.scan(body, None, (imgs, pxs, pys, ni, pr, pc))
    return g


@jax.jit
def pad_only(imgs, pr, pc):
    def body(_c, xs):
        img, r, c = xs
        return _c, dec._dynamic_reflect_pad(img, r, c, PRM, PCM)
    _, g = jax.lax.scan(body, None, (imgs, pr, pc))
    return g


@jax.jit
def banded_only(pxs, pys):
    def body(_c, xs):
        px, py = xs
        R = dec._banded_matrix(px, X + 2 * PRM, px.shape[0])
        C = dec._banded_matrix(py, Y + 2 * PCM, py.shape[0])
        return _c, (jnp.sum(R), jnp.sum(C))
    _, g = jax.lax.scan(body, None, (pxs, pys))
    return g


print("skeleton ni=0:", round(devtime(lambda: skeleton(imgs, pxs, pys, ni, pr, pc)), 2), "ms", file=sys.stderr)
print("skeleton ni=real:", round(devtime(lambda: skeleton(imgs, pxs, pys, ni_real, pr, pc)), 2), "ms", file=sys.stderr)
print("pad only:", round(devtime(lambda: pad_only(imgs, pr, pc)), 2), "ms", file=sys.stderr)
print("banded only:", round(devtime(lambda: banded_only(pxs, pys)[0]), 2), "ms", file=sys.stderr)
