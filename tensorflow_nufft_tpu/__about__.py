"""Package metadata for tensorflow_nufft_tpu.

A from-scratch, TPU-native (JAX/XLA/Pallas) non-uniform fast Fourier
transform framework with the capabilities of mrphys/tensorflow-nufft
(reference: tensorflow_nufft/__about__.py).
"""

__title__ = "tensorflow-nufft-tpu"
__summary__ = (
    "TPU-native non-uniform fast Fourier transform for JAX: Pallas kernels, "
    "autodiff, batching/broadcasting, and multi-chip sharding."
)
__uri__ = "https://localhost/tensorflow-nufft-tpu"
__version__ = "0.1.0"
__author__ = "The TensorFlow NUFFT TPU Authors"
__license__ = "Apache 2.0"
