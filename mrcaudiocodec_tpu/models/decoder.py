"""TPU decoder pipeline: host bitstream parse + batched device synthesis.

Thanks to the MRC1 per-frame length prefixes (docs/FORMAT.md), every frame
is located with one linear scan and the device stage (dequantize -> IMDCT
-> overlap-add) runs fully batched. The Huffman parse itself is host-side.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from ..ops import dsp, quantize
from ..spec import bitstream as spec_bitstream
from ..spec import entropy as spec_entropy


@functools.partial(jax.jit, static_argnames=("window",))
def _synth_stage(q, e_bin, bt, window):
    with jax.default_matmul_precision("highest"):
        xhat = quantize.dequantize(q, e_bin)
        return dsp.synthesize(xhat, bt, window)


def decode(data: bytes):
    """MRC1 bytes -> (pcm [n, channels] float32, cfg). TPU synthesis path."""
    cfg, nf, n_samples, hdr_bits = spec_bitstream.read_header(data)
    nch = cfg.channels
    offs, lens = spec_bitstream.frame_byte_offsets(
        data, hdr_bits // 8, nf * nch)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))

    from .. import tables as T
    from .. import native
    content_offs = offs * 8 + C.FRAME_LEN_BITS
    nat = native.decode_records(data, content_offs, cfg.fs)
    if nat is not None:
        q, e_band, bt, gain = nat
        bin_band = T.unified_layout(cfg.fs)["bin_band"][bt]   # [R, 1024]
        e_bin = np.take_along_axis(e_band, bin_band, axis=1).astype(np.int32)
    else:                       # pure-Python fallback (no C++ toolchain)
        q = np.zeros((nf * nch, C.LONG_COEFFS), np.int32)
        e_bin = np.zeros((nf * nch, C.LONG_COEFFS), np.int32)
        bt = np.zeros(nf * nch, np.int32)
        for i in range(nf * nch):
            cur = spec_entropy._Bits(bits, int(content_offs[i]))
            q[i], e_bin[i], bt[i], _ = spec_entropy.decode_frame_content(
                cur, cfg.fs)

    frames = _synth_stage(jnp.asarray(q), jnp.asarray(e_bin),
                          jnp.asarray(bt), cfg.window)
    frames = np.asarray(frames).reshape(nf, nch, C.LONG_SIZE)
    out = np.zeros((n_samples, nch), np.float32)
    for ch in range(nch):
        y = dsp.overlap_add(jnp.asarray(frames[:, ch]), n_samples)
        out[:, ch] = np.asarray(y)
    return out, cfg
