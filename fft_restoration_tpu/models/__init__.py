from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline, deblur_image
from fft_restoration_tpu.models.filters import FILTERS

__all__ = ["WienerDeblurPipeline", "deblur_image", "FILTERS"]
