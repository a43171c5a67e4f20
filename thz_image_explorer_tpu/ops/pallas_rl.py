"""Pallas TPU kernel: VMEM-resident Richardson-Lucy iterations.

The RL inner loop (``deconvolution.rs:687-708``) is, per iteration, two
small-kernel correlations plus two elementwise ops on a ~(H+2p)² image.
Under plain XLA each iteration's intermediates round-trip through HBM; for
the common case (image padded ≤ ~1k², PSF ≤ 15×15) the entire working set
fits in VMEM, so this kernel runs *all* iterations on-chip: the image, the
PSF and the running estimate stay in VMEM for the whole ``fori_loop``, and
the correlations are statically unrolled shifted multiply-adds on the VPU.

Numerics are identical to the direct-correlation semantics of
:mod:`thz_image_explorer_tpu.ops.deconvolution` (zero-boundary 'same'
correlation, no kernel flip); the band's dynamic geometry (pad widths,
iteration count) stays traced exactly like the XLA path.

STATUS: an alternative kernel, not on the production dispatch path.
``deconvolve_cube`` now runs RL as separable banded matmuls on the MXU
(the reference's PSF is an exact outer product), which is faster, handles
arbitrary kernel sizes, and needs no VMEM-fit qualification; this
general-2D kernel is kept for non-separable PSFs and as a Pallas
reference, exercised by ``tests/test_pallas_rl.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12

# Conservative qualification limits: the kernel keeps 3 image-sized f32
# buffers + the shift scratch in VMEM (~16 MB/core).
MAX_IMAGE_VMEM_BYTES = 3 * 1024 * 1024
MAX_KERNEL_TAPS = 81  # 9x9 — larger banks hit Mosaic compile limits on current backends


def _make_kernel(h2: int, w2: int, kr: int, kc: int, interpret: bool):
    """Build the pallas_call for a (h2, w2) padded image and (kr, kc) PSF
    canvas. Taps live in SMEM (scalar reads); the correlation is a
    statically unrolled pad+slice multiply-add on VPU values."""
    pr, pc = kr // 2, kc // 2

    def correlate(img, k_ref, flip: bool):
        padded_u = jnp.pad(img, ((pr, pr), (pc, pc)))
        acc = jnp.zeros((h2, w2), jnp.float32)
        for a in range(kr):
            for b in range(kc):
                tap = k_ref[kr - 1 - a, kc - 1 - b] if flip else k_ref[a, b]
                acc = acc + tap * jax.lax.slice(
                    padded_u, (a, b), (a + h2, b + w2)
                )
        return acc

    def kernel(n_iter_ref, padded_ref, psf_ref, out_ref):
        padded = padded_ref[:]

        def body(_i, u):
            ustarp = correlate(u, psf_ref, flip=False)
            rel = padded / (ustarp + _EPS)
            # correlation with the mirrored PSF == flipped-tap reads
            corr = correlate(rel, psf_ref, flip=True)
            return u * corr

        out_ref[:] = jax.lax.fori_loop(0, n_iter_ref[0], body, padded)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h2, w2), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def qualifies(h2: int, w2: int, kr: int, kc: int) -> bool:
    return (
        h2 * w2 * 4 <= MAX_IMAGE_VMEM_BYTES
        and kr * kc <= MAX_KERNEL_TAPS
    )


@partial(
    jax.jit, static_argnames=("h2", "w2", "kr", "kc", "interpret")
)
def richardson_lucy_pallas(
    padded: jnp.ndarray,  # (h2, w2) reflect-padded image
    psf: jnp.ndarray,  # (kr, kc) canvas
    psf_mirror: jnp.ndarray,
    n_iter,  # () int32, traced
    *,
    h2: int,
    w2: int,
    kr: int,
    kc: int,
    interpret: bool = False,
) -> jnp.ndarray:
    del psf_mirror  # the kernel reads the taps flipped for the mirror conv
    call = _make_kernel(h2, w2, kr, kc, interpret)
    return call(
        jnp.reshape(n_iter.astype(jnp.int32), (1,)),
        padded.astype(jnp.float32),
        psf.astype(jnp.float32),
    )
