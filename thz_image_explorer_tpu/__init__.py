"""THz Image Explorer — TPU-native rebuild.

A JAX/XLA/Pallas re-implementation of the compute core of
``unibe-icelab/thz-image-explorer`` (a Rust desktop app for interactive
analysis of terahertz time-domain-spectroscopy image scans), re-designed
TPU-first:

* the per-pixel window + FFT + filter chain of the reference
  (``src/math_tools.rs``, ``src/filters/``) becomes batched, jit-compiled
  array programs over the full ``(x, y, t)`` scan cube;
* the reference's mutable pipeline-of-slots scheduler
  (``src/data_thread.rs``) becomes a pure stage graph with host-side
  dirty-index tracking and incremental re-execution;
* rayon pixel parallelism becomes data parallelism over a
  ``jax.sharding.Mesh`` laid over the pixel grid.

Subpackages
-----------
``ops``       jit-compiled compute kernels (windows, FFT, band-passes,
              deconvolution, intensity, ROI reductions, voxel extraction)
``models``    the PSF model family (cubic splines, hybrid fits, Gaussian
              beams) and optical-property models
``pipeline``  stage protocol, filter registry, incremental executor,
              command bus
``io``        dotTHz (HDF5) reader/writer, PSF .npz codec, VTK export
``psf_tool``  knife-edge measurement → frequency-resolved PSF fitting
``parallel``  device-mesh / sharding helpers
``utils``     timing, progress, cancellation, logging
"""

__version__ = "0.1.0"

from thz_image_explorer_tpu.data import ScanCube  # noqa: F401
