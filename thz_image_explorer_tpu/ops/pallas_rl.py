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

Two kernels live here:

* :func:`richardson_lucy_pallas` — the general 2-D unrolled-taps kernel.
  NOT on the production path: realistic PSF canvases are far larger than
  its Mosaic-imposed tap limit (psf.npz at 200x200/0.5 mm gives canvases
  up to 47x57 = 2679 taps vs the 81-tap cap), and the unrolled VPU
  multiply-adds scale with tap count while the separable-matmul path is
  tap-count-independent. Kept for non-separable PSFs and as a Pallas
  reference, exercised by ``tests/test_pallas_rl.py``.
* :func:`rl_bands_separable` — the PRODUCTION TPU kernel: a grid over
  bands where each grid step keeps the whole RL state (padded image,
  running estimate, the band's two banded correlation matrices) resident
  in VMEM for all of that band's iterations. The XLA ``lax.scan``
  equivalent writes every iteration's ~250 KB intermediates back to HBM
  and re-reads them (4 small matmuls per iteration, each a separate HBM
  round-trip). Measured on a v5e at the reference workload (25 bands,
  sum(n_iter)=2377, 246x256 padded images, scripts/profile_pallas.py):
  RL phase ~8.5 ms (XLA scan, HIGH matmuls) -> ~5.3 ms (this kernel,
  hand-built bf16x3), full deconvolution 53.4 -> 50.2 ms. Two dead ends
  measured on the way: Mosaic's default single-pass bf16 matmuls lose
  ~1e-2 relative accuracy (RL amplifies it), and Precision.HIGHEST
  (full-f32, 6 passes) costs more than the HBM traffic it saves
  (55.4 ms full deconvolution — slower than the scan path).
  ``deconvolve_cube`` dispatches to this kernel on TPU backends for
  unsharded cubes whose band matrices fit VMEM; the scan path remains
  for CPU, sharded meshes and oversized geometry.
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


# ----------------------------------------------------------------------
# Production kernel: separable RL, one band per grid step, VMEM-resident
# ----------------------------------------------------------------------

# VMEM working set per band: padded + estimate + 2 temps (h2*w2) plus the
# two banded matrices (h2*h2, w2*w2); qualify against ~16 MB/core with
# headroom for Mosaic's double buffering of the next band's blocks.
MAX_BAND_VMEM_BYTES = 10 * 1024 * 1024


def separable_qualifies(h2: int, w2: int) -> bool:
    return (4 * h2 * w2 + h2 * h2 + w2 * w2) * 4 * 2 <= MAX_BAND_VMEM_BYTES


def _mm3(a, b):
    """Hand-built bf16x3 "f32 emulation" matmul. Mosaic's default matmul
    is single-pass bf16 (~1e-2 rel error, measured — RL's multiplicative
    updates amplify it) and it cannot lower Precision.HIGH, so split each
    operand into a bf16 hi part and a bf16 residual and accumulate the
    three significant cross terms in f32 on the MXU — the same precision
    class as the XLA scan path's HIGH matmuls at half the passes of
    Mosaic's HIGHEST (6)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _sep_kernel(n_iter_ref, padded_ref, r_ref, c_ref, out_ref):
    padded = padded_ref[0]
    R = r_ref[0]
    C = c_ref[0]
    mm = _mm3

    def body(_i, u):
        # corr(u, psf) = R @ u @ C.T ; mirrored psf = R.T @ . @ C
        ustarp = mm(mm(R, u), C.T)
        rel = padded / (ustarp + _EPS)
        return u * mm(mm(R.T, rel), C)

    out_ref[0] = jax.lax.fori_loop(
        0, n_iter_ref[pl.program_id(0)], body, padded
    )


def _sep_kernel_group(n_iter_ref, padded_ref, r_ref, c_ref, out_ref,
                      *, group: int):
    """RL for GROUP bands per grid step, their serial chains interleaved.

    MEASURED DEAD END, kept for the record: one band's RL iteration is a
    chain of 4 tiny dependent matmuls (~2.2 us/iter vs ~0.25 us of MXU
    compute), so interleaving independent bands' chains inside one
    fori_loop looked like free pipelining. At the reference geometry
    (28 bands, 248x256): group=2 36.7 -> 35.7 ms wall (~1 ms device,
    bit-identical output), group=4 fails Mosaic's scoped-VMEM limit
    (20.3 MB of live unrolled temps vs 16 MB). The sequential kernel
    stays on the dispatch path; the grid apparently already overlaps
    adjacent bands' chains enough that in-loop interleaving adds little."""
    mm = _mm3

    nis = [n_iter_ref[pl.program_id(0) * group + g] for g in range(group)]
    n_max = nis[0]
    for g in range(1, group):
        n_max = jnp.maximum(n_max, nis[g])
    padded = [padded_ref[g] for g in range(group)]
    rs = [r_ref[g] for g in range(group)]
    cs = [c_ref[g] for g in range(group)]

    def body(i, us):
        out = []
        for g in range(group):
            ustarp = mm(mm(rs[g], us[g]), cs[g].T)
            rel = padded[g] / (ustarp + _EPS)
            unew = us[g] * mm(mm(rs[g].T, rel), cs[g])
            out.append(jnp.where(i < nis[g], unew, us[g]))
        return tuple(out)

    us = jax.lax.fori_loop(0, n_max, body, tuple(padded))
    for g in range(group):
        out_ref[g] = us[g]


@partial(jax.jit, static_argnames=("group", "interpret"))
def rl_bands_separable_grouped(
    padded: jnp.ndarray,  # (B, h2, w2), B a multiple of `group`
    rs: jnp.ndarray,
    cs: jnp.ndarray,
    n_iter: jnp.ndarray,
    *,
    group: int = 2,  # the ONLY group size measured to compile on Mosaic
    interpret: bool = False,
) -> jnp.ndarray:
    b, h2, w2 = padded.shape
    assert b % group == 0
    # group=4 is a recorded Mosaic failure at reference geometry (20.3 MB
    # of live unrolled temps vs the 16 MB scoped-VMEM limit, see the
    # kernel docstring) — refuse early instead of an opaque remote error
    if group > 2 and not interpret:
        raise ValueError(
            f"group={group} exceeds Mosaic's scoped-VMEM limit at "
            "reference geometry (measured dead end; use group<=2)"
        )
    return pl.pallas_call(
        partial(_sep_kernel_group, group=group),
        grid=(b // group,),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((group, h2, w2), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, h2, h2), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, w2, w2), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, h2, w2), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(n_iter.astype(jnp.int32), padded, rs, cs)


@partial(jax.jit, static_argnames=("interpret",))
def rl_bands_separable(
    padded: jnp.ndarray,  # (B, h2, w2) reflect-padded band images
    rs: jnp.ndarray,  # (B, h2, h2) banded row-correlation matrices
    cs: jnp.ndarray,  # (B, w2, w2) banded column-correlation matrices
    n_iter: jnp.ndarray,  # (B,) int32 per-band trip counts
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """All Richardson-Lucy iterations of every band, one pallas_call.

    The grid runs one band per step; within a step the band's entire RL
    recurrence stays in VMEM (zero HBM traffic between iterations), with
    the matmuls on the MXU. Numerics match ``deconvolution._gains_chunk``'s
    scan body exactly (same operand order, f32 accumulation).
    """
    b, h2, w2 = padded.shape
    return pl.pallas_call(
        _sep_kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h2, w2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h2, h2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, w2, w2), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h2, w2), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(n_iter.astype(jnp.int32), padded, rs, cs)


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
