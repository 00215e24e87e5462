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


@functools.partial(jax.jit, static_argnames=("fs", "window", "pcm16"))
def _synth_chunk(q, e_band, bt, fs, window, pcm16):
    """One chunk's synthesis, carry-free: [R, s, 1024] i16 q + [R, s, NB]
    i16 exps + [R, s] i8 types -> (pcm [R, s*HOP], first [R, HOP] f32,
    tail [R, HOP] f32).

    pcm's first hop is computed WITHOUT the previous chunk's flush half
    (chunks have no sequential dependency, so uploads/compute/downloads
    of all chunks pipeline freely on the tunnel); the host rebuilds each
    seam hop from `first + previous tail` — a single f32 add, bitwise
    identical to a carry chain. With pcm16, pcm is write-ready int16
    (quarter the D2H bytes of f32) and the host re-rounds only the HOP
    seam samples."""
    from ..ops.entropy import _select_by_bt
    with jax.default_matmul_precision("highest"):
        lay = T.unified_layout(fs)
        r, f = bt.shape
        btf = bt.astype(jnp.int32).reshape(-1)
        qf = q.reshape(r * f, -1).astype(jnp.int32)
        ef = e_band.reshape(r * f, -1)
        bin_mask = _select_by_bt(lay["band_mask"], btf).astype(jnp.bfloat16)
        e_bin = jnp.einsum("fn,fin->fi", ef.astype(jnp.bfloat16),
                           bin_mask,
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32).astype(
                               jnp.int32)
        xhat = quantize.dequantize(qf, e_bin)
        frames = dsp.synthesize(xhat, btf, window).reshape(
            r, f, C.LONG_SIZE)
        first = frames[:, :, :C.HOP]
        second = frames[:, :, C.HOP:]
        prev = jnp.concatenate(
            [jnp.zeros((r, 1, C.HOP), jnp.float32), second[:, :-1]], axis=1)
        hops = first + prev
        pcm = hops.reshape(r, f * C.HOP)
        if pcm16:
            pcm = jnp.clip(jnp.round(pcm * 32767.0), -32768, 32767).astype(
                jnp.int16)
        return pcm, hops[:, 0], second[:, -1]


def decode(data: bytes, pcm_dtype="float32"):
    """MRC1 bytes -> (pcm [n, channels], cfg). TPU synthesis path: native
    parallel record parse + carry-free pipelined chunk synthesis."""
    from .encoder import _chunk_schedule

    cfg, nf, n_samples, hdr_bits = spec_bitstream.read_header(data)
    nch = cfg.channels
    lay = T.unified_layout(cfg.fs)
    nb = lay["nb"]
    q, e_band, bt = parse_records(data)
    pcm16 = (pcm_dtype == "int16")

    sizes = _chunk_schedule(nf, DEC_CHUNK)
    bounds = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    nf_pad = int(bounds[-1])
    qc = np.zeros((nch, nf_pad, C.LONG_COEFFS), np.int16)
    ec = np.zeros((nch, nf_pad, nb), np.int16)
    bc = np.zeros((nch, nf_pad), np.int8)
    qc[:, :nf] = np.swapaxes(q.reshape(nf, nch, -1), 0, 1)
    ec[:, :nf] = np.swapaxes(e_band.reshape(nf, nch, -1), 0, 1)
    bc[:, :nf] = bt.reshape(nf, nch).T

    outs = []
    for c in range(len(sizes)):      # async: all chunks pipeline
        sl = slice(int(bounds[c]), int(bounds[c + 1]))
        o = _synth_chunk(jnp.asarray(qc[:, sl]), jnp.asarray(ec[:, sl]),
                         jnp.asarray(bc[:, sl]), cfg.fs, cfg.window, pcm16)
        for a in o:
            a.copy_to_host_async()
        outs.append(o)
    host = jax.device_get(outs)
    pcms = [np.array(h[0]) for h in host]      # writable copies
    firsts = [np.asarray(h[1]) for h in host]
    tails = [np.asarray(h[2]) for h in host]
    for c in range(1, len(pcms)):
        seam = firsts[c] + tails[c - 1]        # single f32 add (exact seam)
        if pcm16:
            pcms[c][:, :C.HOP] = np.clip(np.round(seam * 32767.0),
                                         -32768, 32767).astype(np.int16)
        else:
            pcms[c][:, :C.HOP] = seam
    flat = np.concatenate(pcms, axis=1)
    out = np.ascontiguousarray(flat[:, C.HOP:C.HOP + n_samples].T)
    return out, cfg
