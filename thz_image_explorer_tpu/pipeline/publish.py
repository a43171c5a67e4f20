"""Single-dispatch plot publication.

The reference publishes plot traces by writing many small arrays into
``data_lock`` (``/root/reference/src/data_thread.rs:1336-1560``); a naive
port issues one device read per series, and on a remote-tunnelled TPU each
read pays a full round-trip (~30 ms), making every slider drag ~10 RTTs.
This module gathers EVERY published slice — selected-pixel traces from
three pipeline slots, pixel-mean spectra, all ROI reductions, and the
intensity image — in ONE jit-compiled program followed by ONE
``jax.device_get``, so a full publish costs a single round-trip.

Pixel indices are traced (clicks never recompile); the ROI-mask stack
shape and the avg-in-Fourier flag are static (recompile only when the ROI
count or that toggle changes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from thz_image_explorer_tpu.ops.intensity import (
    intensity_image,
    upscaled_intensity_image,
)
from thz_image_explorer_tpu.ops.mxufft import irfft_ri
from thz_image_explorer_tpu.ops.optical import calculate_optical_properties
from thz_image_explorer_tpu.ops.roi import masked_mean_stack


@partial(
    jax.jit,
    static_argnames=("avg_fourier", "scaling", "ref_mode", "samp_mode"),
)
def _publish_program(
    raw_data,  # (X0, Y0, T0) — slot 0
    raw_time,
    rf_amp,  # raw spectrum slot (fft_index + 1)
    rf_ph,
    rf_freq,
    f_time,
    f_data,  # final slot
    f_amp,
    f_ph,
    f_avg_data,
    f_avg_amp,
    f_avg_ph,
    f_freq,
    masks,  # (R, Xf, Yf) f32 ROI masks on the final slot's grid
    rxy,  # (2,) int32 pixel index per slot (pre-divided by its scaling)
    fxy,
    gxy,
    ref_idx,  # () int32 — ROI index of the optical reference (if ref_mode=roi)
    samp_idx,
    ref_pseudo,  # (2, F) f32 amp/phase of a pseudo-ROI reference (else zeros)
    samp_pseudo,
    thickness,  # () f32
    valid_wh,  # (2,) i32 valid region of the final slot's (padded) grid
    *,
    avg_fourier: bool,
    scaling: int,
    ref_mode: str,  # none | roi | pseudo
    samp_mode: str,  # roi | pixel | pseudo
):
    """Standalone publish over MATERIALIZED slots (exact mode / lean off).

    INVARIANT: this body, :func:`compute_publish_traced`, and the
    pixel/optical tail of the executor's one-pixel click program
    (``executor.Pipeline._build_click`` — the traced ref/samp selection
    ladder over cached ROI means) are the same publication contract
    expressed THREE times — once over materialized slot arrays with
    STATIC optical selectors (cheap here: a recompile costs one small
    program), once over in-program chain temporaries with TRACED
    selectors (mandatory there: a recompile would rebuild the whole
    fused chain), and once gather-sized for clicks. Edit all three
    together; ``tests/test_click_publish.py`` pins click == full.  They are deliberately NOT merged: a shared core
    would need a knob per divergence (selector staticness, the
    ``phases_encoded`` finish, the specred source) in parity-critical
    code.  Any change to the published keys or reduction math must be
    made in BOTH bodies; the equivalence is pinned by the random
    fused-vs-exact sweeps ``tests/test_pipeline.py::
    test_fused_matches_exact_random_configs`` (and ``_specred``).
    """
    n_time = f_data.shape[-1]
    roi_amp = masked_mean_stack(f_amp, masks)
    roi_ph = masked_mean_stack(f_ph, masks)
    if avg_fourier:
        # reconstruct ROI traces from polar means (math_tools.rs:496-529)
        spec_ri = jnp.stack(
            [roi_amp * jnp.cos(roi_ph), roi_amp * jnp.sin(roi_ph)]
        )
        roi_trace = irfft_ri(spec_ri, n_time)
        avg_signal = f_avg_data
    else:
        roi_trace = masked_mean_stack(f_data, masks)
        from thz_image_explorer_tpu.data import masked_pixel_mean

        avg_signal = masked_pixel_mean(f_data, valid_wh)

    if scaling > 1:
        image = upscaled_intensity_image(f_data, scaling)
    else:
        image = intensity_image(f_data)

    pix_amp = f_amp[gxy[0], gxy[1]]
    pix_ph = f_ph[gxy[0], gxy[1]]

    out = dict(
        time=raw_time,
        frequencies=rf_freq,
        filtered_time=f_time,
        filtered_frequencies=f_freq,
        signal=raw_data[rxy[0], rxy[1]],
        signal_fft=rf_amp[fxy[0], fxy[1]],
        phase_fft=rf_ph[fxy[0], fxy[1]],
        filtered_signal=f_data[gxy[0], gxy[1]],
        filtered_signal_fft=pix_amp,
        filtered_phase_fft=pix_ph,
        avg_signal=avg_signal,
        avg_signal_fft=f_avg_amp,
        avg_phase_fft=f_avg_ph,
        roi_amp=roi_amp,
        roi_ph=roi_ph,
        roi_trace=roi_trace,
        image=image,
    )

    # optical properties in the same dispatch (data_thread.rs:1489-1559)
    if ref_mode != "none":
        if ref_mode == "roi":
            ref_amp, ref_ph = roi_amp[ref_idx], roi_ph[ref_idx]
        else:
            ref_amp, ref_ph = ref_pseudo[0], ref_pseudo[1]
        if samp_mode == "roi":
            samp_amp, samp_ph = roi_amp[samp_idx], roi_ph[samp_idx]
        elif samp_mode == "pixel":
            samp_amp, samp_ph = pix_amp, pix_ph
        else:
            samp_amp, samp_ph = samp_pseudo[0], samp_pseudo[1]
        n, alpha, kappa = calculate_optical_properties(
            samp_amp, samp_ph, ref_amp, ref_ph, f_freq, thickness
        )
        out.update(
            refractive_index=n,
            absorption_coefficient=alpha,
            extinction_coefficient=kappa,
        )
    return out


def compute_publish_traced(
    raw_data,
    raw_time,
    rf_amp,
    rf_ph,
    rf_freq,
    final,  # traced ScanCube (full leaves, inside the chain program)
    masks,  # (R, Xf, Yf) f32, R >= 1 (zero masks reduce to zeros)
    rxy,
    fxy,
    gxy,
    opt,  # dict of TRACED optical selectors (see lean_publish_inputs)
    *,
    avg_fourier: bool,
    phases_encoded: bool = False,
    specred=None,
):
    """The publish reductions as a traced function over in-program chain
    values — the leaf-level sparse-materialization core (round-4 task 1):
    called INSIDE the fused chain program, so the final slot's
    fft/amplitudes/phases cubes become XLA temporaries consumed by these
    reductions instead of ~330 MB of HBM outputs nothing reads in full.

    Unlike :func:`_publish_program` (the standalone path over materialized
    slots), the optical reference/sample selectors are TRACED int codes
    (0=none/zeros, 1=roi, 2=pseudo, 3=selected-pixel) — changing the
    optical selection must not recompile the whole chain program.
    See the INVARIANT note on :func:`_publish_program`: three bodies
    (this, :func:`_publish_program`, ``executor._build_click``'s optical
    tail) are one contract; edit all together.

    ``phases_encoded``: the chain ran ``forward_fft(lean_phases=True)``,
    so every phase cube/mean carries :func:`phase_increments` — the
    reductions below are followed by a tiny ``finish_unwrap`` cumsum
    BEFORE any nonlinear consumer (polar reconstruction, optical
    properties). Cumsum is linear, so reduce-then-cumsum equals the
    exact path's cumsum-then-reduce.

    ``specred``: optional ``(raw_spec, wvec)`` — the RAW spectrum cube
    and the factored per-frequency FD weight product. When given, every
    spectral mean comes from ONE pallas pass
    (``ops/pallas_specred.lean_spectral_outputs``) instead of
    materializing amplitude / increment cubes as mask-matmul operands.
    """
    from thz_image_explorer_tpu.ops.fourier import finish_unwrap

    def fin(x):
        return finish_unwrap(x) if phases_encoded else x

    n_time = final.data.shape[-1]
    f_amp, f_ph = final.amplitudes, final.phases
    if specred is not None:
        from thz_image_explorer_tpu.ops.pallas_specred import (
            lean_spectral_outputs,
        )

        # with_complex=False: nothing below reads a complex mean (the
        # executor gates specred off when avg_in_fourier_space is on), so
        # the kernel's cos/sin accumulators are compiled out
        sr = lean_spectral_outputs(
            specred[0], specred[1], masks, final.valid_wh,
            with_complex=False,
        )
        roi_amp, roi_ph = sr["roi_amp"], sr["roi_ph"]
    else:
        sr = None
        roi_amp = masked_mean_stack(f_amp, masks)
        roi_ph = fin(masked_mean_stack(f_ph, masks))
    if avg_fourier:
        spec_ri = jnp.stack(
            [roi_amp * jnp.cos(roi_ph), roi_amp * jnp.sin(roi_ph)]
        )
        roi_trace = irfft_ri(spec_ri, n_time)
        avg_signal = final.avg_data
    else:
        roi_trace = masked_mean_stack(final.data, masks)
        from thz_image_explorer_tpu.data import masked_pixel_mean

        avg_signal = masked_pixel_mean(final.data, final.valid_wh)

    if final.scaling > 1:
        image = upscaled_intensity_image(final.data, final.scaling)
    else:
        image = intensity_image(final.data)

    pix_amp = f_amp[gxy[0], gxy[1]]
    pix_ph = fin(f_ph[gxy[0], gxy[1]])

    out = dict(
        time=raw_time,
        frequencies=rf_freq,
        filtered_time=final.time,
        filtered_frequencies=final.freq,
        signal=raw_data[rxy[0], rxy[1]],
        signal_fft=rf_amp[fxy[0], fxy[1]],
        phase_fft=fin(rf_ph[fxy[0], fxy[1]]),
        filtered_signal=final.data[gxy[0], gxy[1]],
        filtered_signal_fft=pix_amp,
        filtered_phase_fft=pix_ph,
        avg_signal=avg_signal,
        avg_signal_fft=(
            sr["avg_amp"] if sr is not None else final.avg_signal_fft
        ),
        avg_phase_fft=(
            sr["avg_ph"] if sr is not None else fin(final.avg_phase_fft)
        ),
        roi_amp=roi_amp,
        roi_ph=roi_ph,
        roi_trace=roi_trace,
        image=image,
    )

    # optical properties with traced selection (always computed — a few
    # F-length ops; the host exposes them only when a reference is set)
    ref_mode, samp_mode = opt["ref_mode"], opt["samp_mode"]
    ref_amp = jnp.where(
        ref_mode == 1, roi_amp[opt["ref_idx"]], opt["ref_pseudo"][0]
    )
    ref_ph = jnp.where(
        ref_mode == 1, roi_ph[opt["ref_idx"]], opt["ref_pseudo"][1]
    )
    samp_amp = jnp.where(
        samp_mode == 1,
        roi_amp[opt["samp_idx"]],
        jnp.where(samp_mode == 2, opt["samp_pseudo"][0], pix_amp),
    )
    samp_ph = jnp.where(
        samp_mode == 1,
        roi_ph[opt["samp_idx"]],
        jnp.where(samp_mode == 2, opt["samp_pseudo"][1], pix_ph),
    )
    n, alpha, kappa = calculate_optical_properties(
        samp_amp, samp_ph, ref_amp, ref_ph, final.freq, opt["thickness"]
    )
    out.update(
        refractive_index=n,
        absorption_coefficient=alpha,
        extinction_coefficient=kappa,
    )
    return out


def gather_publish(
    raw,
    raw_fd,
    filtered,
    masks,
    pixel,
    avg_fourier: bool,
    optical=None,
):
    """Run the publish program and fetch everything in one transfer.

    ``masks`` is a (R, Xf, Yf) f32 stack — host numpy or an already
    device-resident array (R may be 0); ``pixel`` the un-scaled selected
    pixel. ``optical`` (optional) is a dict with keys ``ref_mode``
    (roi|pseudo), ``samp_mode`` (roi|pixel|pseudo), ``ref_idx``,
    ``samp_idx``, ``ref_pseudo``, ``samp_pseudo`` ((2, F) f32 arrays) and
    ``thickness``. Returns a dict of host numpy arrays.
    """
    import numpy as np

    px, py = pixel

    def idx(cube):
        return np.asarray(
            [
                min(px // cube.scaling, cube.width - 1),
                min(py // cube.scaling, cube.height - 1),
            ],
            np.int32,
        )

    nf = filtered.amplitudes.shape[-1]
    zeros2f = np.zeros((2, nf), np.float32)
    opt = optical or {}
    out = _publish_program(
        raw.data,
        raw.time,
        raw_fd.amplitudes,
        raw_fd.phases,
        raw_fd.freq,
        filtered.time,
        filtered.data,
        filtered.amplitudes,
        filtered.phases,
        filtered.avg_data,
        filtered.avg_signal_fft,
        filtered.avg_phase_fft,
        filtered.freq,
        masks if hasattr(masks, "devices") else jnp.asarray(masks),
        idx(raw),
        idx(raw_fd),
        idx(filtered),
        np.int32(opt.get("ref_idx", 0)),
        np.int32(opt.get("samp_idx", 0)),
        opt.get("ref_pseudo", zeros2f),
        opt.get("samp_pseudo", zeros2f),
        np.float32(opt.get("thickness", 1.0)),
        filtered.valid_wh,
        avg_fourier=avg_fourier,
        scaling=filtered.scaling,
        ref_mode=opt.get("ref_mode", "none"),
        samp_mode=opt.get("samp_mode", "pixel"),
    )
    return jax.device_get(out)
