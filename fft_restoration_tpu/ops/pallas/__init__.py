from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas
from fft_restoration_tpu.ops.pallas.wiener import wiener_pallas

__all__ = ["fft_rows_pallas", "wiener_pallas"]
