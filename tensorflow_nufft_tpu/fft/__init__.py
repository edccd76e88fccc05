"""FFT stage: XLA FFT on the fine grid plus deconvolution/amplification."""

from tensorflow_nufft_tpu.fft.fft_ops import (
    fft_fine,
    deconvolve,
    amplify,
)

__all__ = ["fft_fine", "deconvolve", "amplify"]
