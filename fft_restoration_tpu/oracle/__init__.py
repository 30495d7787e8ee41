from fft_restoration_tpu.oracle.serial import (
    fft_radix2,
    dft_naive,
    transform_rows,
    dft2d,
    wiener_deblur,
    restore_channels,
    restore_image,
)
from fft_restoration_tpu.oracle.psf import motion_blur_kernel_oracle
from fft_restoration_tpu.oracle.color import (
    bgr_to_lab,
    lab_to_bgr,
    apply_white_balance,
)

__all__ = [
    "fft_radix2",
    "dft_naive",
    "transform_rows",
    "dft2d",
    "wiener_deblur",
    "restore_channels",
    "restore_image",
    "motion_blur_kernel_oracle",
    "bgr_to_lab",
    "lab_to_bgr",
    "apply_white_balance",
]
