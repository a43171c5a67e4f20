#!/usr/bin/env python
"""Where do the ~113 ms of the product /api/voxels fetch go?

Decomposes the single-round-trip voxel path (ops/voxel.py
extract_instances_topk) on the real chip: device compute, the
device_get of (vals, idx, thr) as three buffers vs ONE packed buffer,
and the host-side harvest. Hypothesis under test: on a ~27 ms RTT
tunnel, fetching three separate buffers pays more than one round-trip.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_voxel_fetch.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from thz_image_explorer_tpu.ops.voxel import (
        _band_matrix_bf16,
        _voxel_topk_impl,
        extract_instances_topk,
        gaussian_kernel1d,
    )
    from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(200, 200, 1024)).astype(np.float32))
    k_np = gaussian_kernel1d(3.0, 9)
    w = _band_matrix_bf16(jnp.asarray(k_np), 1024, 9)
    K = 120_000
    _sum = jax.jit(jnp.sum)

    def timeit(fn, n=7):
        fn()  # warm
        outs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            outs.append(time.perf_counter() - t0)
        return float(np.median(outs) * 1e3)

    res = {}

    # RTT reference: a no-op barrier
    tiny = jnp.zeros((8,), jnp.float32)
    res["rtt_barrier_ms"] = timeit(lambda: float(_sum(tiny)))

    # 1. device compute only (block via one scalar read of thr)
    def compute_only():
        v, i, t = _voxel_topk_impl(
            data, w, np.float32(2.0), np.float32(0.001), 9, True, K
        )
        float(t)

    res["compute_plus_scalar_read_ms"] = timeit(compute_only)

    # 2. compute + device_get of the 3 buffers (current production shape)
    def fetch3():
        out = _voxel_topk_impl(
            data, w, np.float32(2.0), np.float32(0.001), 9, True, K
        )
        return jax.device_get(out)

    res["compute_fetch3_ms"] = timeit(fetch3)

    # 3. fetch cost alone, 3 buffers vs packed 1 buffer (pre-computed)
    out = _voxel_topk_impl(
        data, w, np.float32(2.0), np.float32(0.001), 9, True, K
    )
    jax.block_until_ready(out)
    res["fetch3_alone_ms"] = timeit(lambda: jax.device_get(out))

    @jax.jit
    def pack(v, i, t):
        return jnp.concatenate(
            [v, i.view(jnp.float32), jnp.full((1,), t, jnp.float32)]
        )

    packed = pack(*out)
    jax.block_until_ready(packed)
    res["fetch1_packed_alone_ms"] = timeit(lambda: jax.device_get(packed))

    # 4. packed end-to-end: compute -> pack in-program -> one fetch
    def fetch_packed():
        o = _voxel_topk_impl(
            data, w, np.float32(2.0), np.float32(0.001), 9, True, K
        )
        return jax.device_get(pack(*o))

    res["compute_fetchpacked_ms"] = timeit(fetch_packed)

    # 5. full product path today
    res["product_extract_ms"] = timeit(
        lambda: extract_instances_topk(
            data, 100.0, 1, (200, 200, 1024), max_points=K,
            opacity_threshold=0.001,
        ),
        n=5,
    )

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
