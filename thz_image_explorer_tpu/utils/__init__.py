"""Host utilities: settings persistence, log ring buffer, update check."""

from thz_image_explorer_tpu.utils.settings import Settings, PsfToolState  # noqa: F401
from thz_image_explorer_tpu.utils.logbuffer import LogRingBuffer, install_log_buffer  # noqa: F401
from thz_image_explorer_tpu.utils.jaxcache import enable_compile_cache  # noqa: F401
