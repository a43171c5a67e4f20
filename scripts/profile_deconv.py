#!/usr/bin/env python
"""Phase-level profiling of the banked RL deconvolution on the real chip.

Times (with scalar-read completion barriers — see memory notes on axon):
  0. _prepare_spectra     (padded r2c spectrum + power + head/tail segments)
  1. gains chunks         (Parseval-minus-tails energy + RL scan), plus an
                           n_iter=0 variant to split energy-vs-RL time
  2. _spectral_band_sum   (final reconstruction from the cached spectrum)

Round-1 baseline (FIR block-matmul energy path): window_cube ~32 ms,
gains chunks ~92 ms (FIR ~85, RL ~8), spectral sum ~40 ms, full ~109 ms
(all including the ~30 ms tunnel RTT of the completion barrier).

Round-4 (2026-08-17, Parseval-energy + pallas RL production path, each
number includes one ~30 ms RTT): prepare_spectra 34.1, energies-only
34.1, energies+RL 41.0 (RL ~6.9), spectral_band_sum 33.0, FULL 48.5 ms
— i.e. ~18 ms device + the barrier RTT: prep ~4, energies ~4, RL ~7,
band sum ~3. The full run pays ONE barrier, so its wall is not the sum
of the per-phase walls. bench's deconv_device_ms amortizes the RTT over
an 8-run window.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache

enable_compile_cache()

from thz_image_explorer_tpu.data import make_cube
from thz_image_explorer_tpu.io import load_psf
from thz_image_explorer_tpu.ops import deconvolution as dec

WIDTH, HEIGHT, NTIME = 200, 200, 1024
DT = 0.05

rng = np.random.default_rng(0)
t = (np.arange(NTIME) * DT).astype(np.float32)
pulse = np.exp(-((t - 8.0) ** 2) / 0.6) * np.sin(2 * np.pi * 1.0 * (t - 8.0))
data = (
    pulse[None, None, :] * rng.uniform(0.3, 1.0, (WIDTH, HEIGHT, 1))
    + 0.01 * rng.normal(size=(WIDTH, HEIGHT, NTIME))
).astype(np.float32)

cube = make_cube(jnp.asarray(t), jnp.asarray(data), dx=0.5, dy=0.5)
psf = load_psf("/root/reference/sample_data/psf.npz")
params = dec.DeconvolutionParams()
geo = dec.plan_bands(params, psf, t, (WIDTH, HEIGHT), 0.5, 0.5)
assert geo is not None

print("n_iter per band:", geo.n_iter.tolist(), file=sys.stderr)
print("sum n_iter:", int(geo.n_iter.sum()), "max:", int(geo.n_iter.max()), file=sys.stderr)

_sum = jax.jit(jnp.sum)
bar = lambda x: float(_sum(x))

n_bands, ntaps = geo.taps.shape
shift = (ntaps - 1) // 2
fft_len = dec._conv_len(NTIME + ntaps - 1)
hseg = min(shift, NTIME)
tseg = min(ntaps - 1 - shift, NTIME)
chunk = 25

# Warm (build device chunks + compile everything) via the public entry.
out = dec.deconvolve_cube(cube.data, geo, chunk_size=chunk)
bar(out)

chunk_list, taps_ri_dev = geo._device_chunks[(chunk, (WIDTH, HEIGHT, NTIME), None)]
pad_r_max = int(geo.pad_r.max())
pad_c_max = int(geo.pad_c.max())


def timeit(fn, n=3):
    best = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best.append(time.perf_counter() - t0)
    return min(best) * 1e3


# 0: prepare spectra
spec, power, xh, xt = dec._prepare_spectra(cube.data, fft_len=fft_len, hseg=hseg, tseg=tseg)
bar(power)
t_prep = timeit(lambda: bar(dec._prepare_spectra(cube.data, fft_len=fft_len, hseg=hseg, tseg=tseg)[1]))
print(f"0 prepare_spectra: {t_prep:.2f} ms  spec={spec.shape}", file=sys.stderr)

# 1: gains chunks (energy + RL)
def run_chunks(chunks):
    g = None
    for ch in chunks:
        g = dec._gains_chunk(power, xh, xt, *ch, shape=cube.data.shape,
                             pad_r_max=pad_r_max, pad_c_max=pad_c_max)
    bar(g)

run_chunks(chunk_list)
t_gains = timeit(lambda: run_chunks(chunk_list))
print(f"1 gains chunks (energy+RL): {t_gains:.2f} ms", file=sys.stderr)

# 1b: same chunk with n_iter=0 -> isolates the energy part
z_chunks = []
for ch in chunk_list:
    z_chunks.append(ch[:-1] + (jnp.zeros_like(ch[-1]),))
run_chunks(z_chunks)
t_energy = timeit(lambda: run_chunks(z_chunks))
print(f"1b gains chunks (n_iter=0, energy only): {t_energy:.2f} ms -> RL part ~{t_gains - t_energy:.2f} ms", file=sys.stderr)

# 2: spectral band sum
gains = [dec._gains_chunk(power, xh, xt, *ch, shape=cube.data.shape,
                          pad_r_max=pad_r_max, pad_c_max=pad_c_max)
         for ch in chunk_list]
def run_c():
    out = dec._spectral_band_sum(
        spec, taps_ri_dev, *gains,
        fft_len=fft_len, shift=shift,
        n_time=NTIME, n_bands=n_bands, shape=(WIDTH, HEIGHT))
    bar(out)
run_c()
t_spec = timeit(run_c)
print(f"2 spectral_band_sum: {t_spec:.2f} ms", file=sys.stderr)

# Full wall for reference
t_full = timeit(lambda: bar(dec.deconvolve_cube(cube.data, geo, chunk_size=chunk)))
print(f"FULL deconvolve_cube: {t_full:.2f} ms", file=sys.stderr)
