from fft_restoration_tpu.parallel.mesh import make_mesh, ROWS_AXIS
from fft_restoration_tpu.parallel.sharded_fft import sharded_fft2d
from fft_restoration_tpu.parallel.sharded_pipeline import (
    ShardedWienerPipeline,
    sharded_restore_planes,
)

__all__ = [
    "make_mesh",
    "ROWS_AXIS",
    "sharded_fft2d",
    "ShardedWienerPipeline",
    "sharded_restore_planes",
]
