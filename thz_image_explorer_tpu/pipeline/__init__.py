"""Pipeline runtime: stage protocol, built-in filters, incremental
executor, host command facade and async worker."""

from thz_image_explorer_tpu.pipeline.stage import (  # noqa: F401
    FilterConfig,
    FilterDomain,
    FilterStage,
    StageContext,
    build_chain,
    instantiate_filters,
    register_filter,
    registered_filters,
)
from thz_image_explorer_tpu.pipeline import filters as _builtin_filters  # noqa: F401
from thz_image_explorer_tpu.pipeline.executor import Pipeline, PipelineConfig  # noqa: F401
from thz_image_explorer_tpu.pipeline.explorer import Explorer, PlotData  # noqa: F401
from thz_image_explorer_tpu.pipeline.worker import CommandQueue, ExplorerWorker  # noqa: F401
