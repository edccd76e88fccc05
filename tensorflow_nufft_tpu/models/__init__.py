"""Application model families built on the NUFFT (MRI reconstruction)."""

from tensorflow_nufft_tpu.models import mri

__all__ = ["mri"]
