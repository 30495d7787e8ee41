from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas
from fft_restoration_tpu.ops.pallas.postprocess import (
    lab_l_sum_partials,
    wb_encode_u8,
)
from fft_restoration_tpu.ops.pallas.wiener import wiener_pallas

__all__ = [
    "fft_rows_pallas",
    "lab_l_sum_partials",
    "wb_encode_u8",
    "wiener_pallas",
]
