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
