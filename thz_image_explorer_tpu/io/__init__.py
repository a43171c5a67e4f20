"""Host I/O: dotTHz (HDF5) files, PSF .npz codec, VTK export, file utils."""

from thz_image_explorer_tpu.io.dotthz import (  # noqa: F401
    DotthzMetadata,
    HostScan,
    finalize_scan,
    open_pulse,
    open_scan,
    open_scan_host,
    load_metadata,
    save_scan,
    update_metadata,
)
from thz_image_explorer_tpu.io.psf_npz import load_psf, save_psf  # noqa: F401
from thz_image_explorer_tpu.io.files import find_files_with_same_extension  # noqa: F401
