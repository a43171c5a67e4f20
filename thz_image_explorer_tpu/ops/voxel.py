"""3-D voxel-view extraction: the fused envelope/threshold kernel.

Device-side equivalent of ``instance_from_data``
(``/root/reference/src/gui/threed_plot.rs:132-270``): square the traces,
convolve each with a 1-D Gaussian envelope raised to a contrast exponent,
min-max normalize each surviving trace, and derive the dynamic opacity
threshold that caps the view at 2 million instances. Everything up to the
sparse instance extraction is one jitted program; only the (threshold,
opacities) leave the device, and the host builds the sparse instance list.
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_INSTANCES = 2_000_000  # threed_plot.rs:207
C_M_PER_S = 300_000_000.0  # threed_plot.rs:153
BASE_CUBE_SIZE = 0.25  # threed_plot.rs:149


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """Normalized Gaussian taps (``threed_plot.rs:82-102``)."""
    x = np.arange(2 * radius + 1, dtype=np.float32) - radius
    k = np.exp(-x * x / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _dynamic_threshold(flat: jnp.ndarray) -> jnp.ndarray:
    """Opacity of the ~2M-th largest voxel via a two-level scanned
    histogram instead of an exact ``top_k``.

    ``top_k`` over the 41M-element opacity volume measured ~150 ms on a
    v5e (its sort dominates the whole voxel extraction); two 64-way
    count-above-edge passes bound the same order statistic to 1/4096
    opacity precision in two streamed reads. The refined edge is chosen
    so the kept-instance count stays <= MAX_INSTANCES (the reference's
    ``select_nth_unstable`` cap, ``threed_plot.rs:207-214``); opacities
    are normalized to [0, 1] so absolute precision is 2.4e-4 — invisible
    at 8-bit display depth.
    """
    n = flat.shape[0]
    chunk = 1 << 20
    n_pad = ((n + chunk - 1) // chunk) * chunk
    # pad with -1: below every edge, never counted
    flat = jnp.concatenate(
        [flat, jnp.full((n_pad - n,), -1.0, flat.dtype)]
    ).reshape(-1, chunk)

    def counts_ge(edges):
        def body(acc, ch):
            return acc + jnp.sum(
                ch[None, :] >= edges[:, None], axis=1
            ).astype(jnp.int32), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros(edges.shape, jnp.int32), flat
        )
        return acc

    def refine(lo, hi):
        edges = lo + (hi - lo) * jnp.arange(65, dtype=jnp.float32) / 64.0
        c = counts_ge(edges)
        # smallest edge whose count is still <= MAX_INSTANCES; if NO edge
        # satisfies the cap (pathological mass above the top edge), fall
        # back to the TOP edge — the cap may be exceeded only by ties at
        # the maximum, never by a silent fall-through to the low edge
        ok = c <= MAX_INSTANCES
        idx = jnp.where(jnp.any(ok), jnp.argmax(ok), 64)
        below = jnp.maximum(idx, 1) - 1
        return edges[idx], edges[below], c[idx], c[below]

    e1, lo1, _, _ = refine(jnp.float32(0.0), jnp.float32(1.0))
    e2, lo2, n2, nb2 = refine(lo1, e1)
    # tie-spike guard: when one refined bin holds a huge tie mass at the
    # cap boundary, the chosen edge can keep almost nothing while the
    # edge below keeps the whole tie set. The reference keeps the cap
    # INCLUDING arbitrary ties (select_nth_unstable, threed_plot.rs:
    # 207-214) — prefer a tie overflow over a near-empty view.
    cliff = (n2 < MAX_INSTANCES // 4) & (nb2 > MAX_INSTANCES)
    return jnp.where(cliff, lo2, e2)


def _pallas_gate(data, impl: str | None = None) -> tuple[bool, bool]:
    """One dispatch policy for BOTH voxel entry points: returns
    ``(use_pallas, interpret)``. Policy: explicit ``impl`` argument,
    else ``THZ_VOXEL_IMPL``, else pallas on an unsharded TPU cube whose
    double-buffered line blocks + bf16 band matrix fit the VMEM budget.
    ``THZ_PALLAS_INTERPRET=1`` runs the kernel interpreted (the same
    debug/test switch the deconvolution pallas kernel honors,
    ops/deconvolution.py)."""
    import os

    if impl is None:
        impl = os.environ.get("THZ_VOXEL_IMPL", "auto")
    interpret = os.environ.get("THZ_PALLAS_INTERPRET", "0") == "1"
    sharded = getattr(getattr(data, "sharding", None), "num_devices", 1) > 1
    t = data.shape[-1]
    # VMEM budget: double-buffered f32 in/out line blocks plus the
    # double-buffered (t, t) bf16 banded kernel matrix
    vmem = 2 * (2 * t * 4 * _PALLAS_LINES) + 2 * (2 * t * t)
    use_pallas = impl == "pallas" or (
        impl == "auto"
        and jax.default_backend() == "tpu"
        and not sharded
        and vmem <= 10 * 1024 * 1024
    )
    return use_pallas, interpret


def _normalized_opacities(data, kernel, contrast, opacity_threshold,
                          radius: int, use_pallas: bool,
                          interpret: bool = False):
    """Envelope + per-trace min-max normalization (no cap threshold).
    ``kernel`` is the (2r+1,) tap vector on the XLA path, or the
    prebuilt bf16 banded matrix from :func:`_band_matrix_bf16` on the
    pallas path (built host-side — tap values must be concrete)."""
    x, y, t = data.shape
    if use_pallas:
        return _envelope_pallas(
            data.reshape(x * y, t), kernel, contrast, opacity_threshold,
            interpret=interpret,
        ).reshape(x, y, t)
    sq = data * data
    powed = jnp.power(sq, contrast)
    # zero-boundary 'same' correlation along t for all pixels at once
    env = jax.lax.conv_general_dilated(
        powed.reshape(x * y, 1, t),
        kernel.reshape(1, 1, -1),
        (1,),
        [(radius, radius)],
        dimension_numbers=("NCH", "IOH", "NCH"),
        preferred_element_type=jnp.float32,
    ).reshape(x, y, t)

    line_max = env.max(axis=-1, keepdims=True)
    line_min = env.min(axis=-1, keepdims=True)
    rng = line_max - line_min
    return jnp.where(
        (line_max >= opacity_threshold) & (jnp.abs(rng) > 1e-6),
        (env - line_min) / rng,
        0.0,
    )


@partial(jax.jit, static_argnames=("radius", "use_pallas", "interpret"))
def _voxel_opacities_impl(data, kernel, contrast, opacity_threshold,
                          radius: int, use_pallas: bool,
                          interpret: bool = False):
    x, y, t = data.shape
    normalized = _normalized_opacities(
        data, kernel, contrast, opacity_threshold, radius, use_pallas,
        interpret,
    )
    if x * y * t > MAX_INSTANCES:
        threshold = _dynamic_threshold(normalized.reshape(-1))
    else:
        threshold = jnp.asarray(0.0, jnp.float32)
    return normalized, threshold


def voxel_opacities(
    data: jnp.ndarray,  # (X, Y, T)
    kernel: jnp.ndarray,  # (2*radius+1,)
    contrast,
    opacity_threshold,
    radius: int,
    impl: str | None = None,  # "auto" | "pallas" | "xla"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Opacity volume + dynamic threshold.

    Pipeline per trace (``threed_plot.rs:166-218``):
    ``v -> v²``, envelope = zero-boundary correlation of ``(v²)^contrast``
    with the Gaussian kernel, zero the trace if its max is below
    ``opacity_threshold`` else min-max normalize; then the threshold that
    keeps at most 2M instances (the value of the ~2M-th largest opacity,
    via :func:`_dynamic_threshold`).

    On TPU the envelope pipeline runs as one fused pallas pass
    (:func:`_envelope_pallas`) — square, power, the unrolled Gaussian
    correlation, min/max and normalization never leave VMEM; the XLA
    composition is the fallback (CPU, sharded inputs, oversized blocks).
    Measured v5e numbers in ``scripts/profile_voxel.py``.
    """
    use_pallas, interpret = _pallas_gate(data, impl)
    if use_pallas:
        # pass host taps: np.asarray on a device array is a d2h readback
        # (a full round-trip on the tunnelled TPU)
        kernel = _band_matrix_bf16(
            np.asarray(kernel, np.float32), data.shape[-1], radius
        )
    return _voxel_opacities_impl(
        data, kernel, contrast, opacity_threshold, radius, use_pallas,
        interpret,
    )


# ------------------------------------------------------------------
# Fused envelope pipeline as a pallas kernel (TPU production path)
# ------------------------------------------------------------------

_PALLAS_LINES = 256  # traces per grid step; VMEM ~= 4 bufs * LINES * T * 4B
# bounded LRU of device-resident (t, t) bf16 band matrices — sigma/radius
# sliders generate many distinct kernels and each matrix is ~2 MB HBM
_BAND_CACHE: OrderedDict = OrderedDict()
_BAND_CACHE_MAX = 8


def _envelope_kernel(scal_ref, x_ref, w_ref, o_ref):
    v = x_ref[:]
    contrast, thr = scal_ref[0], scal_ref[1]
    sq = v * v
    powed = jnp.exp(contrast * jnp.log(jnp.maximum(sq, 1e-30)))
    # jnp.power semantics (and f32::powf, threed_plot.rs:173): 0^c = 0
    # for c > 0 but 0^0 = 1 — the XLA path and the reference both
    # return 1 at contrast == 0
    powed = jnp.where(
        sq == 0.0, jnp.where(contrast == 0.0, 1.0, 0.0), powed
    )
    # zero-boundary 'same' correlation along t as ONE MXU matmul against
    # the banded kernel matrix (lane-shift unrolls are what kill Mosaic
    # compiles at larger radii — the old general-2D kernel's 9x9 cap).
    # W arrives pre-cast to bf16 (f32 would not fit VMEM double-buffered
    # at t=1024); the data operand is split bf16x2, leaving ~1e-3 display
    # error from the tap quantization — the XLA fallback remains the
    # full-f32 reference.
    ph = powed.astype(jnp.bfloat16)
    plo = (powed - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    w = w_ref[:]
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    env = d(ph, w) + d(plo, w)
    lmax = jnp.max(env, axis=-1, keepdims=True)
    lmin = jnp.min(env, axis=-1, keepdims=True)
    rng = lmax - lmin
    o_ref[:] = jnp.where(
        (lmax >= thr) & (jnp.abs(rng) > 1e-6), (env - lmin) / rng, 0.0
    )


def _band_matrix_bf16(kernel, t: int, radius: int) -> jnp.ndarray:
    """Banded correlation matrix W[k, i] = kernel[k - i + radius], host
    data cached per (kernel bytes, t) — the 'same' correlation as one
    matmul. bf16: f32 would not fit VMEM double-buffered at t=1024."""
    kb = np.asarray(kernel, np.float32)
    key = (kb.tobytes(), t)
    w = _BAND_CACHE.get(key)
    if w is None:
        ii = np.arange(t)
        idx = ii[:, None] - ii[None, :] + radius  # [k, i] -> tap index
        valid = (idx >= 0) & (idx < kb.shape[0])
        w = np.where(valid, kb[np.clip(idx, 0, kb.shape[0] - 1)], 0.0)
        w = jnp.asarray(w.astype(np.float32)).astype(jnp.bfloat16)
        _BAND_CACHE[key] = w
        while len(_BAND_CACHE) > _BAND_CACHE_MAX:
            _BAND_CACHE.popitem(last=False)
    else:
        _BAND_CACHE.move_to_end(key)
    return w


@partial(jax.jit, static_argnames=("interpret",))
def _envelope_pallas(flat, w, contrast, thr, *, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, t = flat.shape
    lines = _PALLAS_LINES
    n_pad = ((n + lines - 1) // lines) * lines
    if n_pad != n:
        flat = jnp.concatenate(
            [flat, jnp.zeros((n_pad - n, t), flat.dtype)]
        )
    scal = jnp.stack(
        [jnp.asarray(contrast, jnp.float32), jnp.asarray(thr, jnp.float32)]
    )
    out = pl.pallas_call(
        _envelope_kernel,
        grid=(n_pad // lines,),
        out_shape=jax.ShapeDtypeStruct((n_pad, t), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lines, t), lambda i: (i, 0)),
            pl.BlockSpec((t, t), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((lines, t), lambda i: (i, 0)),
        interpret=interpret,
    )(scal, flat, w)
    return out[:n]


def _topk_core(data, kernel, contrast, opacity_threshold,
               radius: int, use_pallas: bool, k: int,
               interpret: bool = False):
    """Shared opacity -> ``approx_max_k`` compaction behind both fetch
    formats (f16+i32 pair and packed u32) — one body, so the threshold /
    recall semantics can never diverge between them."""
    normalized = _normalized_opacities(
        data, kernel, contrast, opacity_threshold, radius, use_pallas,
        interpret,
    )
    flat = normalized.reshape(-1)
    k = min(k, flat.shape[0])
    return jax.lax.approx_max_k(flat, k, recall_target=0.95)


@partial(jax.jit, static_argnames=("radius", "use_pallas", "k", "interpret"))
def _voxel_topk_impl(data, kernel, contrast, opacity_threshold,
                     radius: int, use_pallas: bool, k: int,
                     interpret: bool = False):
    """Opacity pipeline + on-device sparse compaction: the ``k`` brightest
    voxels' (values, flat indices) plus the 2M-cap threshold, so ONE
    small transfer replaces shipping the whole opacity volume to the host
    (~1 MB vs 164 MB at 41M voxels; the host's ``np.nonzero`` harvest
    disappears too). ``approx_max_k`` is the TPU-native binned top-k —
    ~recall 0.95 against an exact sort, invisible in a point-cloud view;
    exact ``top_k`` over 41M elements measured ~150 ms (sort-bound),
    approx runs in single-digit ms.

    The cap threshold here is the k-th largest opacity — the fetched
    tail — NOT the scanned-histogram 2M order statistic of the dense
    path: with a top-N view cap the N-th largest IS the reference's cap
    semantics (``select_nth_unstable`` at the cap, ``threed_plot.rs:
    207-214``) applied at N=k, and the two histogram passes it replaces
    measured ~19.5 ms device at 41M voxels (scripts/probe_voxel_fetch.py)
    vs ~4.4 ms for the whole envelope+top-k. Values ship as f16 (display
    precision; indices must stay int32 for 41M-element addressing)."""
    vals, idx = _topk_core(
        data, kernel, contrast, opacity_threshold, radius, use_pallas, k,
        interpret,
    )
    vals = vals.astype(jnp.float16)
    # threshold in the SAME rounded space the values ship in: f16 rounding
    # is monotonic, so vals_f16 >= f16(k-th) keeps exactly the points the
    # exact comparison would — an exact f32 threshold against f16-rounded
    # values drops every point whose rounding lands just below it
    # (including, half the time, the k-th point itself)
    threshold = jnp.maximum(vals[-1].astype(jnp.float32), 0.0)
    return vals, idx.astype(jnp.int32), threshold


#: alpha quantization of the packed fetch: 6 bits leaves 26 for the flat
#: voxel index (67M voxels — covers the padded 208x208x1024 product grid)
_PACK_ALPHA_BITS = 6
_PACK_ALPHA_MAX = (1 << _PACK_ALPHA_BITS) - 1
_PACK_IDX_LIMIT = 1 << (32 - _PACK_ALPHA_BITS)


@partial(jax.jit, static_argnames=("radius", "use_pallas", "k", "interpret"))
def _voxel_topk_packed(data, kernel, contrast, opacity_threshold,
                       radius: int, use_pallas: bool, k: int,
                       interpret: bool = False):
    """:func:`_voxel_topk_impl` with the (value, index) pair bit-packed
    into ONE uint32 per point: ``idx << 6 | round(opacity * 63)``.

    The fetch is link-bound on this harness (~28 MB/s tunnel): the f16 +
    i32 pair costs 6 B/point (720 kB at the 120k view cap, ~26 ms on the
    wire) while 4 B/point is 480 kB (~17 ms). 6-bit alpha = 64 opacity
    levels — at the 1-3 px point size the canvas draws, indistinguishable
    from f16 (the reference renders 8-bit alpha anyway,
    ``threed_plot.rs:216-230``). Requires ``data.size < 2**26``; callers
    fall back to :func:`_voxel_topk_impl` above that."""
    vals, idx = _topk_core(
        data, kernel, contrast, opacity_threshold, radius, use_pallas, k,
        interpret,
    )
    threshold = jnp.maximum(vals[-1], 0.0)
    q = jnp.clip(
        jnp.round(vals * _PACK_ALPHA_MAX), 0, _PACK_ALPHA_MAX
    ).astype(jnp.uint32)
    packed = (idx.astype(jnp.uint32) << _PACK_ALPHA_BITS) | q
    return packed, threshold


def extract_instances_topk(
    data: jnp.ndarray,
    time_span: float,
    scaling: int,
    original_dims: tuple[int, int, int],
    *,
    max_points: int,
    valid_grid: tuple[int, int] | None = None,
    opacity_threshold: float = 0.1,
    contrast: float = 2.0,
    kernel_sigma: float = 3.0,
    kernel_radius: int = 9,
) -> tuple[np.ndarray, np.ndarray, float, float, float, float]:
    """Single-round-trip voxel extraction for the live 3-D view.

    Same geometry/colors as :func:`extract_instances`, but the device
    program compacts to the ``max_points`` brightest voxels and ONE
    ``device_get`` fetches (values, indices, threshold) together —
    replacing the round-3 path's full-volume transfer + second threshold
    read (the review's two-round-trip finding, ``threed_plot.rs:132-270``).
    Selection is top-N by opacity — the reference's own cap semantics
    (``select_nth_unstable``, ``threed_plot.rs:207-214``) — instead of the
    old host-side random subsample. The dense path remains for VTU export
    (up to the full 2M instances).
    """
    import os

    use_pallas, interpret = _pallas_gate(data)
    t = data.shape[-1]
    # keep the taps on the host until dispatch: converting them to a
    # device array and reading them back for the band-cache key costs a
    # full tunnel round-trip per call (~40 ms measured on the product
    # seam, scripts/probe_voxel_fetch.py)
    taps = gaussian_kernel1d(kernel_sigma, kernel_radius)
    kernel = (
        _band_matrix_bf16(taps, t, kernel_radius)
        if use_pallas
        else jnp.asarray(taps)
    )
    use_packed = (
        data.size < _PACK_IDX_LIMIT
        and os.environ.get("THZ_VOXEL_PACKED", "1") != "0"
    )
    if use_packed:
        packed, thr = jax.device_get(
            _voxel_topk_packed(
                data, kernel, np.float32(contrast),
                np.float32(opacity_threshold), kernel_radius, use_pallas,
                int(max_points), interpret,
            )
        )
        idx = (packed >> _PACK_ALPHA_BITS).astype(np.int64)
        q = (packed & _PACK_ALPHA_MAX).astype(np.float32)
        vals = q / _PACK_ALPHA_MAX
        thr = float(thr)
        # keep-mask in quantized space so the k-th point (== thr) is not
        # dropped by its own rounding; q == 0 (alpha < 1/126) never drawn
        keep_q = q >= max(np.floor(thr * _PACK_ALPHA_MAX), 1.0)
    else:
        vals, idx, thr = jax.device_get(
            _voxel_topk_impl(
                data, kernel, np.float32(contrast),
                np.float32(opacity_threshold), kernel_radius, use_pallas,
                int(max_points), interpret,
            )
        )
        vals = vals.astype(np.float32)
        thr = float(thr)
        keep_q = (vals >= max(thr, 1e-30)) & (vals > 0.0)

    gx, gy, gz = data.shape
    xs = idx // (gy * gz)
    rem = idx - xs * (gy * gz)
    ys = rem // gz
    zs = rem - ys * gz
    # keep: above the 2M-cap threshold, nonzero, and inside the valid grid
    keep = keep_q
    if valid_grid is not None:
        keep &= (xs < valid_grid[0]) & (ys < valid_grid[1])
        gx, gy = min(gx, valid_grid[0]), min(gy, valid_grid[1])
    xs, ys, zs, opacity = xs[keep], ys[keep], zs[keep], vals[keep]

    ox, oy, oz = original_dims
    cube_width = cube_height = BASE_CUBE_SIZE
    cube_depth = BASE_CUBE_SIZE / (time_span * C_M_PER_S / 1.0e9 * 2.0)
    spacing_w = (ox * cube_width) / gx
    spacing_h = (oy * cube_height) / gy
    spacing_d = (oz * cube_depth) / gz
    half_w = ox * BASE_CUBE_SIZE / 2.0
    half_h = oy * BASE_CUBE_SIZE / 2.0
    half_d = oz * cube_depth / 2.0
    positions = np.stack(
        [
            ys * spacing_h - half_h,
            half_w - xs * spacing_w,
            half_d - zs * spacing_d,
        ],
        axis=-1,
    ).astype(np.float32)
    rgb = jet_colormap((opacity - thr) / (1.0 - thr)) if thr < 1.0 else (
        jet_colormap(np.zeros_like(opacity))
    )
    rgba = np.concatenate([rgb, opacity[:, None]], axis=-1).astype(np.float32)
    # returned dims are the RENDERED voxel size: the reference stamps
    # scale = scaling on every instance (threed_plot.rs:239,262) so
    # downscaled cubes draw proportionally larger voxels; with one
    # scalar per extraction that per-instance scale folds into the dims
    s = float(scaling)
    return (positions, rgba, cube_width * s, cube_height * s,
            cube_depth * s, thr)


def jet_colormap(value: np.ndarray) -> np.ndarray:
    """(N,) opacity -> (N, 3) rgb (``threed_plot.rs:123-130``)."""
    v4 = 4.0 * np.asarray(value)
    r = np.clip(v4 - 1.5, 0.0, 1.0)
    g = np.clip(v4 - 0.5, 0.0, 1.0) - np.clip(v4 - 2.5, 0.0, 1.0)
    b = 1.0 - np.clip(v4 - 1.5, 0.0, 1.0)
    return np.stack([r, g, b], axis=-1)


def extract_instances(
    data: jnp.ndarray,
    time_span: float,
    scaling: int,
    original_dims: tuple[int, int, int],
    *,
    valid_grid: tuple[int, int] | None = None,
    opacity_threshold: float = 0.1,
    contrast: float = 2.0,
    kernel_sigma: float = 3.0,
    kernel_radius: int = 9,
) -> tuple[np.ndarray, np.ndarray, float, float, float, float]:
    """Full voxel extraction: returns ``(positions (N,3), rgba (N,4),
    cube_width, cube_height, cube_depth, threshold)``.

    Geometry (spacing computed from the *original* dims so downscaled data
    keeps the plot size, ``threed_plot.rs:156-162``; z depth scaled by the
    round-trip time-of-flight ``threed_plot.rs:153-154``); jet colors with
    the opacity re-normalized above the dynamic threshold. ``valid_grid``
    restricts extraction to the valid region of a bucket-padded grid
    (``original_dims`` are then the true pre-scaling scan dims); the
    device program still runs on the padded grid so it is shared across
    scan sizes — only the host-side instance harvest filters.
    """
    opac, thr = voxel_opacities(
        data, gaussian_kernel1d(kernel_sigma, kernel_radius),
        np.float32(contrast), np.float32(opacity_threshold),
        kernel_radius,
    )
    opac = np.asarray(opac)
    thr = float(thr)

    gx, gy, gz = opac.shape
    if valid_grid is not None:
        gx, gy = min(gx, valid_grid[0]), min(gy, valid_grid[1])
        opac = opac[:gx, :gy]
    ox, oy, oz = original_dims
    cube_width = cube_height = BASE_CUBE_SIZE
    cube_depth = BASE_CUBE_SIZE / (time_span * C_M_PER_S / 1.0e9 * 2.0)
    spacing_w = (ox * cube_width) / gx
    spacing_h = (oy * cube_height) / gy
    spacing_d = (oz * cube_depth) / gz
    half_w = ox * BASE_CUBE_SIZE / 2.0
    half_h = oy * BASE_CUBE_SIZE / 2.0
    half_d = oz * cube_depth / 2.0

    keep = opac >= thr
    xs, ys, zs = np.nonzero(keep)
    opacity = opac[xs, ys, zs]

    positions = np.stack(
        [
            ys * spacing_h - half_h,
            half_w - xs * spacing_w,
            half_d - zs * spacing_d,
        ],
        axis=-1,
    ).astype(np.float32)
    rgb = jet_colormap((opacity - thr) / (1.0 - thr))
    rgba = np.concatenate([rgb, opacity[:, None]], axis=-1).astype(np.float32)
    # fold the reference's per-instance scale into the rendered voxel
    # dims (threed_plot.rs:239,262 — see extract_instances_topk)
    s = float(scaling)
    return (positions, rgba, cube_width * s, cube_height * s,
            cube_depth * s, thr)
