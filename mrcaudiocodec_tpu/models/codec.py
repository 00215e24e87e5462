"""TPU codec API: encode/decode with the same signature as the spec codec.

`mrcaudiocodec_tpu.models.codec` is the flagship engine (JAX/XLA batched
pipeline); `mrcaudiocodec_tpu.spec.codec` is the normative NumPy oracle.
"""
from .decoder import decode  # noqa: F401
from .encoder import encode, encode_arrays, pack_stream  # noqa: F401
