from fft_restoration_tpu.parallel.mesh import (
    BATCH_AXIS,
    ROWS_AXIS,
    make_mesh,
    make_mesh2d,
)
from fft_restoration_tpu.parallel.sharded_fft import sharded_fft2d
from fft_restoration_tpu.parallel.sharded_pipeline import (
    ShardedWienerPipeline,
    sharded_batched_restore_planes,
    sharded_restore_planes,
)

__all__ = [
    "make_mesh",
    "make_mesh2d",
    "ROWS_AXIS",
    "BATCH_AXIS",
    "sharded_fft2d",
    "ShardedWienerPipeline",
    "sharded_restore_planes",
    "sharded_batched_restore_planes",
]
