"""Pallas RL kernel vs the XLA direct path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from thz_image_explorer_tpu.ops.deconvolution import (
    _correlate_same,
    _richardson_lucy,
)
from thz_image_explorer_tpu.ops.pallas_rl import (
    qualifies,
    richardson_lucy_pallas,
)


def _case(h2=40, w2=36, kr=7, kc=5, n_iter=4, seed=0):
    rng = np.random.default_rng(seed)
    padded = rng.uniform(0.1, 1.0, (h2, w2)).astype(np.float32)
    psf = rng.uniform(0.0, 1.0, (kr, kc)).astype(np.float32)
    return padded, psf


def test_pallas_rl_matches_xla_direct():
    padded, psf = _case()
    psf_m = psf[::-1, ::-1]
    n_iter = jnp.asarray(4, jnp.int32)

    k = jnp.asarray(psf)
    kf = jnp.asarray(psf_m)
    expected = _richardson_lucy(
        jnp.asarray(padded), n_iter,
        lambda a: _correlate_same(a, k),
        lambda a: _correlate_same(a, kf),
    )
    got = richardson_lucy_pallas(
        jnp.asarray(padded), jnp.asarray(psf), jnp.asarray(psf_m), n_iter,
        h2=padded.shape[0], w2=padded.shape[1],
        kr=psf.shape[0], kc=psf.shape[1], interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=1e-5
    )


def test_pallas_rl_zero_iterations_is_identity():
    padded, psf = _case()
    got = richardson_lucy_pallas(
        jnp.asarray(padded), jnp.asarray(psf), jnp.asarray(psf[::-1, ::-1]),
        jnp.asarray(0, jnp.int32),
        h2=padded.shape[0], w2=padded.shape[1],
        kr=psf.shape[0], kc=psf.shape[1], interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), padded)


def test_qualification_limits():
    assert qualifies(260, 260, 9, 9)
    assert not qualifies(2000, 2000, 9, 9)  # image too big for VMEM
    assert not qualifies(100, 100, 11, 11)  # too many taps


def test_separable_bands_kernel_matches_scan_semantics():
    """rl_bands_separable (the production TPU kernel) reproduces the XLA
    scan body's banded-matmul RL exactly, per band with its own geometry
    and trip count (interpret mode; the TPU numbers live in
    scripts/profile_pallas.py)."""
    from thz_image_explorer_tpu.ops.deconvolution import _banded_matrix
    from thz_image_explorer_tpu.ops.pallas_rl import rl_bands_separable

    rng = np.random.default_rng(3)
    B, h2, w2 = 3, 24, 136
    padded = rng.uniform(0.5, 2.0, (B, h2, w2)).astype(np.float32)
    rs = np.stack([
        _banded_matrix(rng.uniform(0.1, 0.5, 2 * k + 1).astype(np.float32), h2)
        for k in (1, 2, 3)
    ])
    cs = np.stack([
        _banded_matrix(rng.uniform(0.1, 0.5, 2 * k + 1).astype(np.float32), w2)
        for k in (2, 1, 4)
    ])
    n_iter = np.array([4, 0, 7], np.int32)

    got = np.asarray(rl_bands_separable(
        jnp.asarray(padded), jnp.asarray(rs), jnp.asarray(cs),
        jnp.asarray(n_iter), interpret=True,
    ))
    for b in range(B):
        u = padded[b].copy()
        for _ in range(int(n_iter[b])):
            rel = padded[b] / (rs[b] @ u @ cs[b].T + 1e-12)
            u = u * (rs[b].T @ rel @ cs[b])
        np.testing.assert_allclose(got[b], u, rtol=2e-3, atol=1e-4)


def test_separable_qualification():
    from thz_image_explorer_tpu.ops.pallas_rl import separable_qualifies

    assert separable_qualifies(246, 256)  # reference default geometry
    assert not separable_qualifies(1200, 1200)


def test_separable_grouped_matches_sequential():
    """The (measured dead-end, kept) grouped-interleave kernel is
    bit-compatible with the sequential production kernel."""
    from thz_image_explorer_tpu.ops.deconvolution import _banded_matrix
    from thz_image_explorer_tpu.ops.pallas_rl import (
        rl_bands_separable,
        rl_bands_separable_grouped,
    )

    rng = np.random.default_rng(7)
    B, h2, w2 = 4, 16, 128
    padded = jnp.asarray(rng.uniform(0.5, 2.0, (B, h2, w2)).astype(np.float32))
    rs = jnp.asarray(np.stack([
        _banded_matrix(rng.uniform(0.1, 0.4, 3).astype(np.float32), h2)
        for _ in range(B)]))
    cs = jnp.asarray(np.stack([
        _banded_matrix(rng.uniform(0.1, 0.4, 5).astype(np.float32), w2)
        for _ in range(B)]))
    ni = jnp.asarray(np.array([6, 2, 0, 4], np.int32))
    a = np.asarray(rl_bands_separable(padded, rs, cs, ni, interpret=True))
    g = np.asarray(rl_bands_separable_grouped(
        padded, rs, cs, ni, group=2, interpret=True))
    np.testing.assert_allclose(a, g, rtol=1e-6, atol=1e-7)
