"""TPU decoder pipeline: native host parse + device synthesis/overlap-add.

The MRC1 per-frame length prefixes (docs/FORMAT.md) let the C++ runtime
parse all frame records in parallel; the device then dequantizes, IMDCTs
and overlap-adds whole fixed-size chunks, and only the final PCM crosses
back to the host (one hop per chunk; chunk seams are 1024-sample
overlap-adds done on the host).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import tables as T
from ..ops import dsp, quantize
from ..spec import bitstream as spec_bitstream
from ..spec import entropy as spec_entropy

import os as _os
DEC_CHUNK = int(_os.environ.get("MRC_DEC_CHUNK", 1024))


@functools.partial(jax.jit, static_argnames=("fs", "window", "pcm16"))
def _synth_chunk(q, e_band, bt, carry_in, fs, window, pcm16):
    """[R,CHUNK,1024] i16 q + [R,CHUNK,NB] i16 exponents + [R,CHUNK] i8
    types + [R,HOP] f32 seam carries -> (pcm [R,CHUNK*HOP],
    carry_out [R,HOP] f32). Rows are independent channels, decoded in one
    dispatch (they fold into the frame batch axis for synthesis).

    pcm is int16 (write-ready, rounded after all overlap-adds) when pcm16,
    else float32. The seam between chunks stays in float via the carry.
    """
    with jax.default_matmul_precision("highest"):
        from ..ops.entropy import _select_by_bt
        lay = T.unified_layout(fs)
        r, f = bt.shape
        bt = bt.astype(jnp.int32).reshape(-1)
        qf = q.reshape(r * f, -1)
        ef = e_band.reshape(r * f, -1)
        bin_mask = _select_by_bt(lay["band_mask"], bt).astype(jnp.bfloat16)
        e_bin = jnp.einsum("fn,fin->fi", ef.astype(jnp.bfloat16),
                           bin_mask,
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32).astype(
                               jnp.int32)
        xhat = quantize.dequantize(qf.astype(jnp.int32), e_bin)
        frames = dsp.synthesize(xhat, bt, window).reshape(
            r, f, C.LONG_SIZE)                           # [R, CHUNK, 2048]
        first = frames[:, :, :C.HOP]
        second = frames[:, :, C.HOP:]
        y = jnp.concatenate(
            [first, jnp.zeros((r, 1, C.HOP), jnp.float32)], axis=1)
        y = y.at[:, 1:].add(second)
        y = y.at[:, 0].add(carry_in)
        flat = y.reshape(r, -1)
        pcm, carry_out = flat[:, :-C.HOP], flat[:, -C.HOP:]
        if pcm16:
            pcm = jnp.clip(jnp.round(pcm * 32767.0), -32768, 32767).astype(
                jnp.int16)
        return pcm, carry_out


def parse_records(data: bytes):
    """Parse every channel-frame record of an MRC1 stream on the host.

    Returns (q [nf*nch, 1024] i32, e_band [nf*nch, NB] i32,
    bt [nf*nch] i32) in record (frame, channel) order — via the native
    C++ parallel parser when built, else the pure-Python fallback."""
    cfg, nf, _, hdr_bits = spec_bitstream.read_header(data)
    nch = cfg.channels
    offs, _ = spec_bitstream.frame_byte_offsets(
        data, hdr_bits // 8, nf * nch)

    from .. import native
    content_offs = offs * 8 + C.FRAME_LEN_BITS
    lay = T.unified_layout(cfg.fs)
    nb = lay["nb"]
    nat = native.decode_records(data, content_offs, cfg.fs)
    if nat is not None:
        q, e_band, bt, gain = nat
    else:                       # pure-Python fallback (no C++ toolchain)
        bits = np.unpackbits(np.frombuffer(data, np.uint8))
        q = np.zeros((nf * nch, C.LONG_COEFFS), np.int32)
        e_band = np.zeros((nf * nch, nb), np.int32)
        bt = np.zeros(nf * nch, np.int32)
        for i in range(nf * nch):
            cur = spec_entropy._Bits(bits, int(content_offs[i]))
            qi, e_bin_i, bti, gaini = spec_entropy.decode_frame_content(
                cur, cfg.fs)
            q[i], bt[i] = qi, bti
            edges = lay["edges"][bti]
            # per-band exponent = e at the band's first bin (gain for
            # zero-width padding bands)
            first_bin = np.minimum(edges[:-1], C.LONG_COEFFS - 1)
            e_band[i] = np.where(lay["width"][bti] > 0,
                                 e_bin_i[first_bin], gaini)
    return q, e_band, bt


def decode(data: bytes, pcm_dtype="float32"):
    """MRC1 bytes -> (pcm [n, channels], cfg). TPU synthesis path.

    pcm_dtype="int16" returns write-ready 16-bit PCM (half the
    device->host bytes; rounding happens on device after overlap-add)."""
    cfg, nf, n_samples, hdr_bits = spec_bitstream.read_header(data)
    nch = cfg.channels
    lay = T.unified_layout(cfg.fs)
    nb = lay["nb"]
    q, e_band, bt = parse_records(data)

    # de-interleave records (f, ch) -> per channel [nf, ...]
    q = q.reshape(nf, nch, -1)
    e_band = e_band.reshape(nf, nch, -1)
    bt = bt.reshape(nf, nch)

    pcm16 = (pcm_dtype == "int16")
    from .encoder import _chunk_schedule
    sizes = _chunk_schedule(nf, DEC_CHUNK)
    n_chunks = len(sizes)
    bounds = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    nf_pad = int(bounds[-1])
    qc = np.zeros((nch, nf_pad, C.LONG_COEFFS), np.int16)
    ec = np.zeros((nch, nf_pad, nb), np.int16)
    bc = np.zeros((nch, nf_pad), np.int8)
    qc[:, :nf] = np.swapaxes(q, 0, 1)
    ec[:, :nf] = np.swapaxes(e_band, 0, 1)
    bc[:, :nf] = bt.T
    carry = jnp.zeros((nch, C.HOP), jnp.float32)
    chunks_out = []
    for c in range(n_chunks):        # all channels in one dispatch
        sl = slice(int(bounds[c]), int(bounds[c + 1]))
        pcm, carry = _synth_chunk(jnp.asarray(qc[:, sl]),
                                  jnp.asarray(ec[:, sl]),
                                  jnp.asarray(bc[:, sl]), carry,
                                  cfg.fs, cfg.window, pcm16)
        pcm.copy_to_host_async()
        chunks_out.append(pcm)
    P = np.concatenate([np.asarray(p) for p in chunks_out], axis=1)
    out = np.ascontiguousarray(P[:, C.HOP:C.HOP + n_samples].T)
    return out, cfg
