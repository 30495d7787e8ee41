from fft_restoration_tpu.utils.padding import (
    is_power_of_two,
    next_power_of_two,
    pad_to_power_of_two,
)
from fft_restoration_tpu.utils.timing import PhaseProfiler, Phase
from fft_restoration_tpu.utils.verify import (
    l2_diff,
    inf_diff,
    psnr,
    channels_equal,
    VerifyReport,
)

__all__ = [
    "is_power_of_two",
    "next_power_of_two",
    "pad_to_power_of_two",
    "PhaseProfiler",
    "Phase",
    "l2_diff",
    "inf_diff",
    "psnr",
    "channels_equal",
    "VerifyReport",
]
