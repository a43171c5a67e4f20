"""jit-compiled compute kernels over the scan cube."""

from thz_image_explorer_tpu.ops.windows import (  # noqa: F401
    WindowType,
    adapted_blackman_window,
    window_array,
)
from thz_image_explorer_tpu.ops.fourier import (  # noqa: F401
    forward_fft,
    inverse_fft,
    unwrap,
)
from thz_image_explorer_tpu.ops.scaling import scale_cube  # noqa: F401
from thz_image_explorer_tpu.ops.intensity import intensity_image  # noqa: F401
from thz_image_explorer_tpu.ops.optical import calculate_optical_properties  # noqa: F401
from thz_image_explorer_tpu.ops.mxufft import (  # noqa: F401
    irfft_ri,
    rfft_ri,
    use_matmul_fft,
)
from thz_image_explorer_tpu.ops.firapply import (  # noqa: F401
    fir_block_matrix,
    fir_correlate_bands,
)
from thz_image_explorer_tpu.ops.roi import (  # noqa: F401
    masked_mean_stack,
    masked_mean_trace,
    polygon_mask,
)
from thz_image_explorer_tpu.ops.deconvolution import (  # noqa: F401
    DeconvolutionParams,
    deconvolve_cube,
    plan_bands,
)
