"""Pallas TPU kernel: every spectral publish reduction in ONE pass.

STATUS (2026-08-18): a recorded dead end for the DEFAULT path, kept as
a tested env-gated alternative (``THZ_SPECRED=1`` forces it on). The
kernel itself is fast (1.32 ms at the bench shape after lane padding +
MXU masked sums), but the round-4 phase-increments and DFT-fold reworks
made the surrounding lean XLA program cheaper than the kernel-bearing
program in both fold regimes (5.31/5.49 vs 6.45/6.65 ms —
``scripts/profile_specred.py``): the kernel needs raw real/imag planes
and lane pads materialized that the lean program never writes.

The lean interactive program consumes the filtered spectrum in four
reduced forms (``math_tools.rs:421-440`` — mean complex spectrum, mean
amplitude, mean unwrapped phase — plus the ROI masked means of
``main.rs``'s polygon averaging): under plain XLA each of the amplitude
and phase-increment reductions is a mask-stack matmul whose operand must
be MATERIALIZED (an (N, F) f32 temp written to and re-read from HBM,
~105 MB each at the bench shape), and the complex mean reads the
spectrum again. This kernel fuses all of them into one pass over the
spectrum's real/imag components: per row-block it computes ``amp =
sqrt(c^2 + s^2)``, ``ang = atan2(s, c)`` and the wrapped phase
increments (``ops/fourier.phase_increments`` semantics, i.e. the
reference's unwrap loop ``math_tools.rs:226-238`` before its cumsum),
then accumulates the masked row-sums of amp / increments / cos / sin for
every mask in the stack. Nothing cube-sized is ever written.

Mask convention: row 0 of ``masks`` is the VALID-region mask (the
bucket-padding mask behind ``data.masked_pixel_mean``); rows 1.. are the
ROI stack (``ops/roi.masked_mean_stack``). The caller divides by the
mask counts (sums here, means outside).

Numerics: the masked row-sums run on the MXU as split-bf16 dots (the
0/1 masks are exact in bf16; each payload is split hi + lo so the pair
of f32-accumulated dots carries ~2^-18 relative error). Measured
2026-08-18 (/tmp/specred_isolate.py): MXU sums differ from the exact
f32 VPU adds by 2.5e-6 relative at the bench shape while cutting the
kernel 2.09 -> 1.32 ms; both paths sit 5.8e-3 from a float64 oracle on
RANDOM data — a shared +-pi wrap-flip artifact of adversarial inputs
(15 diffs within 2e-6 of pi), not a summation error. The optical
formulas consume phase MEANS, so the split error lands far below
measurement noise; ``THZ_SPECRED_MXU=0`` restores the VPU adds.
Verified against the XLA path by ``tests/test_specred.py``.

Dispatch rules (``spectral_reduction_sums`` refuses otherwise):
unsharded arrays, a row-block that divides N (rows are multiples of 8 on
bucketed grids), and a block x F working set that fits VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: VMEM budget for the per-step working set (c, s, amp, ang, inc blocks
#: plus slack) — conservative fraction of the 16 MB scoped limit.
_VMEM_BUDGET = 8 * 1024 * 1024
_TWO_PI = float(2.0 * np.pi)


def _plan_blocks(n: int, f: int) -> tuple[int, int] | None:
    """Row-block plan ``(block, n_pad)`` for ``n`` pixel rows.

    The block is ALSO the lane-axis tile of the (M, N) masks operand
    (``_specred_call``'s third BlockSpec), and the Mosaic lowering
    REQUIRES a block's lane dim to be a multiple of 128 or equal to the
    whole array dim (measured on the real toolchain 2026-08-18: a
    %8-only 400-row block was rejected at lowering; interpret mode had
    accepted it). So: a single block when the whole grid fits VMEM,
    else the largest 128-multiple block that fits and ``n`` zero-padded
    up to a block multiple (``spectral_reduction_sums`` pads; padded
    rows have zero mask weight, so every sum is unchanged — at most
    127 x F x 3 f32 of extra traffic, ~0.3 MB at the bench shape)."""
    cap = _VMEM_BUDGET // max(1, 6 * f * 4)
    if n % 8 == 0 and n <= max(8, cap):
        return n, n  # one block == the array dim: no alignment rule
    b = (min(1024, cap) // 128) * 128
    if b == 0:
        return None
    # never a block larger than the padded row count itself
    b = min(b, -(-n // 128) * 128)
    # the largest dividing block wins (zero pad, fewest steps); else the
    # largest block outright — padding costs at most ~(b-1) x F x 12
    # bytes of extra traffic (~2 MB at the bench shape), cheaper than
    # the extra grid steps a pad-minimizing small block would add
    for blk in range(b, 0, -128):
        if n % blk == 0:
            return blk, n
    return b, n + ((-n) % b)


_HALF_PI = float(np.pi / 2.0)
_PI = float(np.pi)


def _atan2(s, c):
    """f32 atan2 from Mosaic-supported primitives (the TPU lowering has
    no atan2/atan, measured 2026-08-18): octant reduction to a ratio in
    [0, 1], two atan double-angle reductions (z -> z/(1+sqrt(1+z^2))
    maps [0,1] -> [0,0.199]), then the odd Taylor series through z^9 —
    truncation < 1e-8, below f32 rounding. Matches ``jnp.arctan2`` on
    every octant incl. the axes (atan2(0, c<0) = pi, atan2(0, 0) = 0);
    the sign of a negative-zero ``s`` is not preserved (published phases
    never difference against +-0)."""
    ax, ay = jnp.abs(s), jnp.abs(c)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.where(hi > 0.0, hi, 1.0)
    z1 = z / (1.0 + jnp.sqrt(1.0 + z * z))
    z2 = z1 / (1.0 + jnp.sqrt(1.0 + z1 * z1))
    t = z2 * z2
    r = 4.0 * z2 * (
        1.0 + t * (-1.0 / 3.0 + t * (0.2 + t * (-1.0 / 7.0 + t / 9.0)))
    )
    r = jnp.where(ax > ay, _HALF_PI - r, r)
    r = jnp.where(c < 0.0, _PI - r, r)
    return jnp.where(s < 0.0, -r, r)


def _kernel(c_ref, s_ref, m_ref, *out_refs, n_masks: int,
            with_complex: bool, mxu: bool):
    amp_ref, inc_ref = out_refs[0], out_refs[1]
    i = pl.program_id(0)
    c = c_ref[...]
    s = s_ref[...]
    amp = jnp.sqrt(c * c + s * s)
    ang = _atan2(s, c)
    # wrapped diffs along F: roll-by-one then fix lane 0 to ang itself
    # (phase_increments: inc[0] = phi0, inc[k] = wrap(phi_k - phi_{k-1}));
    # the wrap rule itself is SHARED with ops/fourier (one source of
    # truth for the parity-critical strict > pi comparisons)
    from thz_image_explorer_tpu.ops.fourier import wrap_adjust

    sh = pltpu.roll(ang, shift=1, axis=1)
    w = wrap_adjust(ang - sh)
    col = jax.lax.broadcasted_iota(jnp.int32, ang.shape, 1)
    inc = jnp.where(col == 0, ang, w)

    @pl.when(i == 0)
    def _init():
        for ref in out_refs:
            ref[...] = jnp.zeros_like(ref)

    m = m_ref[...]  # (M, B) 0/1 f32
    # The cos/sin (complex-mean) sums only exist when the caller consumes
    # them — the product publish path never reads avg_fft (specred is
    # gated off when avg_in_fourier_space would need it), and XLA cannot
    # DCE inside a pallas_call, so they are compiled out here instead.
    if mxu:
        # MXU masked sums: the 0/1 mask is exact in bf16; each payload
        # splits hi + lo so the pair of f32-accumulated dots carries
        # ~2^-18 relative error (module docstring: 2.5e-6 measured vs
        # the VPU adds, 2.09 -> 1.32 ms at the bench shape)
        mm = m.astype(jnp.bfloat16)

        def msum(x):
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = lambda u: jnp.dot(mm, u, preferred_element_type=jnp.float32)
            return d(xh) + d(xl)

        amp_ref[...] += msum(amp)
        inc_ref[...] += msum(inc)
        if with_complex:
            out_refs[2][...] += msum(c)
            out_refs[3][...] += msum(s)
    else:
        # unrolled VPU masked sums: exact f32 adds
        for r in range(n_masks):
            wr = m[r][:, None]
            amp_ref[r, :] += jnp.sum(amp * wr, axis=0)
            inc_ref[r, :] += jnp.sum(inc * wr, axis=0)
            if with_complex:
                out_refs[2][r, :] += jnp.sum(c * wr, axis=0)
                out_refs[3][r, :] += jnp.sum(s * wr, axis=0)


@partial(jax.jit,
         static_argnames=("block", "interpret", "with_complex", "mxu"))
def _specred_call(spec_c, spec_s, masks, *, block: int, interpret: bool,
                  with_complex: bool, mxu: bool):
    n, f = spec_c.shape
    m = masks.shape[0]
    grid = (n // block,)
    n_out = 4 if with_complex else 2
    kern = partial(_kernel, n_masks=m, with_complex=with_complex, mxu=mxu)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, f), lambda i: (i, 0)),
            pl.BlockSpec((block, f), lambda i: (i, 0)),
            pl.BlockSpec((m, block), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((m, f), lambda i: (0, 0))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((m, f), jnp.float32)] * n_out,
        interpret=interpret,
    )(spec_c, spec_s, masks)
    return tuple(out) + (None,) * (4 - n_out)


# Process-wide fallback latch: the Mosaic compiler on the remote TPU
# runtime can reject kernels that interpret mode accepts (CLAUDE.md:
# "big lane-shift unrolls fail the remote compiler opaquely"). The first
# dispatch failure of a specred-bearing program trips this latch and the
# caller rebuilds without the kernel (pipeline/executor._dispatch_lean,
# parallel/step.lean_update) — the product degrades to the XLA
# mask-matmul reductions instead of a dead interactive path.
_RUNTIME_BROKEN: list = [False]


def mark_runtime_broken(err: BaseException) -> None:
    """Latch the kernel off for the rest of the process, loudly."""
    if not _RUNTIME_BROKEN[0]:
        _RUNTIME_BROKEN[0] = True
        import logging

        logging.getLogger(__name__).warning(
            "one-pass spectral-reduction kernel failed at compile/run "
            "time; falling back to XLA reductions for this process: %s",
            err,
        )


def is_runtime_broken() -> bool:
    return _RUNTIME_BROKEN[0]


def latchable_specred_error(err: BaseException) -> bool:
    """True when *err* plausibly originated in lowering/compiling/running
    THIS kernel (Mosaic/pallas custom-call machinery or this module's own
    dispatch checks) — only then may the callers latch the kernel off and
    retry with the XLA reductions. Anything else (a shape/param bug, an
    OOM in an unrelated op) must SURFACE instead of being silently
    absorbed into a misleading 'kernel failed' degradation (advisor r4).
    Matching is by marker substrings over the exception chain: the remote
    Mosaic toolchain raises several concrete types (XlaRuntimeError,
    INTERNAL RET_CHECKs, LoweringException) that share no useful base
    class, so type-narrowing alone cannot express this predicate."""
    parts = []
    e: BaseException | None = err
    for _ in range(8):  # bound: __context__ chains can be long/cyclic
        if e is None:
            break
        parts.append(f"{type(e).__module__}.{type(e).__name__}: {e}")
        e = e.__cause__ or e.__context__
    text = " | ".join(parts).lower()
    markers = (
        "mosaic",
        "pallas",
        "tpu_custom_call",
        "custom_call",
        "vmem",
        "specred",
        "spectral_reduction",
        "lane-aligned row-block",  # _plan_blocks refusal (this module)
        "mask stack too deep",  # dispatch-contract check (this module)
    )
    return any(m in text for m in markers)


def specred_env() -> bool | None:
    """Tri-state ``THZ_SPECRED``: unset -> None (auto — which the
    callers resolve to OFF: after the round-4 lean-phases and FD/TD
    fold reworks the XLA-reductions program beats the kernel program at
    the bench shape in BOTH regimes, 5.31 vs 6.45 ms folded and 5.49 vs
    6.65 ms unfolded (scripts/profile_specred.py, 2026-08-18) — the
    kernel must materialize raw real/imag planes + lane pads that the
    lean XLA program never writes, outweighing the amp/increment
    operand materialization it saves), ``"0"`` -> False (never),
    ``"1"`` -> True (force: the A/B and parity-test hook)."""
    import os

    v = os.environ.get("THZ_SPECRED")
    return None if v is None else v != "0"


def specred_supported(n: int, f: int, n_masks: int, sharded: bool) -> bool:
    """Host-side dispatch predicate (the kernel is single-device).

    Consults ``specred_env()`` so the tri-state default lives in exactly
    one place: unset/auto resolves to OFF here too — this predicate
    alone never enables the recorded-dead-end kernel (advisor r4)."""
    import os

    if _RUNTIME_BROKEN[0]:
        return False
    if specred_env() is not True:
        return False
    if sharded or n_masks > 16:
        return False
    if jax.default_backend() != "tpu" and (
        os.environ.get("THZ_PALLAS_INTERPRET", "0") != "1"
    ):
        return False
    # plan with the SAME 128-lane-padded F the kernel call uses
    # (spectral_reduction_sums pads f before _plan_blocks) so predicate
    # and call agree near the VMEM cap (advisor r4)
    return _plan_blocks(n, -(-f // 128) * 128) is not None


def lean_spectral_outputs(raw_fft, wvec, masks, valid_wh,
                          with_complex: bool = True):
    """The lean publisher's five spectral reductions from ONE kernel pass.

    ``raw_fft``: (X, Y, F) complex64 RAW spectrum (post-window, pre-FD
    filters — the reference's published phases are the raw spectrum's,
    ``band_pass_fd.rs`` leaves phases untouched). ``wvec``: (F,) f32
    product of the active per-frequency FD masks (band-pass x notch) —
    being per-frequency it factors OUT of every pixel sum, so amplitude
    and complex means are ``w * mean(raw)``. ``masks``: (R, X, Y) ROI
    stack. ``valid_wh``: traced (2,) valid size (padded pixels are
    exactly zero, so the valid mean is a plain sum / count —
    ``data.masked_pixel_mean``). Returns the publish dict fields
    ``avg_fft / avg_amp / avg_ph / roi_amp / roi_ph`` (phases finished
    with the cumsum — the kernel emits ``phase_increments``).
    ``with_complex=False`` (the product publish path, which never reads
    the complex mean) compiles the cos/sin accumulators out of the kernel
    and omits ``avg_fft`` from the result."""
    from thz_image_explorer_tpu.ops.fourier import finish_unwrap

    x, y, nf = raw_fft.shape
    n = x * y
    r = masks.shape[0]
    sc = jnp.real(raw_fft).reshape(n, nf)
    ss = jnp.imag(raw_fft).reshape(n, nf)
    mflat = masks.reshape(r, n).astype(jnp.float32)
    mstack = jnp.concatenate(
        [jnp.ones((1, n), jnp.float32), mflat], axis=0
    )
    amp_s, inc_s, cos_s, sin_s = spectral_reduction_sums(
        sc, ss, mstack, with_complex=with_complex
    )

    vcnt = jnp.maximum(valid_wh[0] * valid_wh[1], 1).astype(jnp.float32)
    rcnt = jnp.sum(mflat, axis=1)
    safe = jnp.where(rcnt > 0, rcnt, 1.0)[:, None]
    nonzero = (rcnt > 0)[:, None]
    out = dict(
        avg_amp=amp_s[0] * wvec / vcnt,
        avg_ph=finish_unwrap(inc_s[0] / vcnt),
        roi_amp=jnp.where(nonzero, amp_s[1:] * wvec[None, :] / safe, 0.0),
        roi_ph=finish_unwrap(jnp.where(nonzero, inc_s[1:] / safe, 0.0)),
    )
    if with_complex:
        out["avg_fft"] = ((cos_s[0] + 1j * sin_s[0]) * wvec / vcnt).astype(
            jnp.complex64
        )
    return out


def spectral_reduction_sums(spec_c, spec_s, masks, with_complex=True):
    """One-pass spectral reductions.

    ``spec_c``/``spec_s``: (N, F) f32 real/imag of the filtered spectrum
    (flattened pixels). ``masks``: (M, N) f32 0/1 stack, row 0 = valid
    mask, rows 1.. = ROIs. Returns ``(amp_sums, inc_sums, cos_sums,
    sin_sums)``, each (M, F) f32 row-sums; divide by mask counts for the
    means, ``finish_unwrap`` the inc means for true phases.
    ``with_complex=False`` skips the cos/sin accumulation entirely
    (returns ``None`` in their slots).
    """
    import os

    n, f = spec_c.shape
    # enforce the module-docstring dispatch contract here, not only in
    # the callers' specred_supported() gate: a sharded operand would
    # fail deep inside pallas with an opaque error (the kernel is
    # single-device), and the unrolled mask loop is bounded
    for arr in (spec_c, spec_s, masks):
        if getattr(getattr(arr, "sharding", None), "num_devices", 1) > 1:
            raise ValueError("spectral_reduction_sums is single-device; "
                             "gather or reduce per-shard instead")
    if masks.shape[0] > 16:
        raise ValueError(f"mask stack too deep ({masks.shape[0]} > 16): "
                         "the per-mask sums are unrolled in the kernel")
    # lane-align the frequency axis too: F = T/2+1 is always odd, and a
    # 513-lane tile costs Mosaic edge handling on EVERY elementwise op —
    # padding to the 128 lane width measured 3.03 -> 2.09 ms at the
    # bench shape (2026-08-18 variant sweep). Padded lanes live at
    # k >= F, so the roll-by-one increments of real lanes are untouched;
    # outputs are sliced back before returning.
    f_pad = -(-f // 128) * 128
    plan = _plan_blocks(n, f_pad)
    if plan is None:
        raise ValueError(f"no lane-aligned row-block fits VMEM for F={f}")
    block, n_pad = plan
    if f_pad != f:
        spec_c = jnp.pad(spec_c, ((0, 0), (0, f_pad - f)))
        spec_s = jnp.pad(spec_s, ((0, 0), (0, f_pad - f)))
    if n_pad != n:
        # zero rows + zero mask weights contribute exactly 0 to every
        # accumulator (amp/inc of a zero row are finite, weight is 0)
        pad = ((0, n_pad - n), (0, 0))
        spec_c = jnp.pad(spec_c, pad)
        spec_s = jnp.pad(spec_s, pad)
        masks = jnp.pad(masks, ((0, 0), (0, n_pad - n)))
    interpret = (
        jax.default_backend() != "tpu"
        or os.environ.get("THZ_PALLAS_INTERPRET", "0") == "1"
    )
    mxu = os.environ.get("THZ_SPECRED_MXU", "1") != "0"
    m = masks.shape[0]
    m_pad = -(-m // 8) * 8 if mxu else m
    if m_pad != m:
        # the MXU dot's LHS wants a sublane-aligned row count; zero mask
        # rows produce all-zero sum rows, sliced off below
        masks = jnp.pad(masks, ((0, m_pad - m), (0, 0)))
    out = _specred_call(
        spec_c, spec_s, masks, block=block, interpret=interpret,
        with_complex=bool(with_complex), mxu=mxu,
    )
    if f_pad != f or m_pad != m:
        out = tuple(o if o is None else o[:m, :f] for o in out)
    return out
