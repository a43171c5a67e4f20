"""Device-mesh / sharding layer."""

from thz_image_explorer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_cube,
    cube_sharding,
)
from thz_image_explorer_tpu.parallel.step import interactive_update  # noqa: F401
