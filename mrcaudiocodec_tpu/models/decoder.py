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
    """[CHUNK,1024] i16 q + [CHUNK,NB] i16 exponents + [CHUNK] i8 types
    + [HOP] f32 seam carry -> (pcm [CHUNK*HOP], carry_out [HOP] f32).

    pcm is int16 (write-ready, rounded after all overlap-adds) when pcm16,
    else float32. The seam between chunks stays in float via the carry.
    """
    with jax.default_matmul_precision("highest"):
        from ..ops.entropy import _select_by_bt
        lay = T.unified_layout(fs)
        bt = bt.astype(jnp.int32)
        bin_mask = _select_by_bt(lay["band_mask"], bt).astype(jnp.bfloat16)
        e_bin = jnp.einsum("fn,fin->fi", e_band.astype(jnp.bfloat16),
                           bin_mask,
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32).astype(
                               jnp.int32)
        xhat = quantize.dequantize(q.astype(jnp.int32), e_bin)
        frames = dsp.synthesize(xhat, bt, window)        # [CHUNK, 2048]
        first = frames[:, :C.HOP]
        second = frames[:, C.HOP:]
        y = jnp.concatenate(
            [first, jnp.zeros((1, C.HOP), jnp.float32)], axis=0)
        y = y.at[1:].add(second)
        y = y.at[0].add(carry_in)
        flat = y.reshape(-1)
        pcm, carry_out = flat[:-C.HOP], flat[-C.HOP:]
        if pcm16:
            pcm = jnp.clip(jnp.round(pcm * 32767.0), -32768, 32767).astype(
                jnp.int16)
        return pcm, carry_out


def decode(data: bytes, pcm_dtype="float32"):
    """MRC1 bytes -> (pcm [n, channels], cfg). TPU synthesis path.

    pcm_dtype="int16" returns write-ready 16-bit PCM (half the
    device->host bytes; rounding happens on device after overlap-add)."""
    cfg, nf, n_samples, hdr_bits = spec_bitstream.read_header(data)
    nch = cfg.channels
    offs, lens = spec_bitstream.frame_byte_offsets(
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

    # de-interleave records (f, ch) -> per channel [nf, ...]
    q = q.reshape(nf, nch, -1)
    e_band = e_band.reshape(nf, nch, -1)
    bt = bt.reshape(nf, nch)

    pcm16 = (pcm_dtype == "int16")
    n_chunks = -(-nf // DEC_CHUNK)
    nf_pad = n_chunks * DEC_CHUNK
    out = np.zeros((n_samples, nch), np.int16 if pcm16 else np.float32)
    for ch in range(nch):
        qc = np.zeros((nf_pad, C.LONG_COEFFS), np.int16)
        ec = np.zeros((nf_pad, nb), np.int16)
        bc = np.zeros(nf_pad, np.int8)
        qc[:nf] = q[:, ch]
        ec[:nf] = e_band[:, ch]
        bc[:nf] = bt[:, ch]
        carry = jnp.zeros(C.HOP, jnp.float32)
        chunks_out = []
        for c in range(n_chunks):
            sl = slice(c * DEC_CHUNK, (c + 1) * DEC_CHUNK)
            pcm, carry = _synth_chunk(jnp.asarray(qc[sl]),
                                      jnp.asarray(ec[sl]),
                                      jnp.asarray(bc[sl]), carry,
                                      cfg.fs, cfg.window, pcm16)
            pcm.copy_to_host_async()
            chunks_out.append(pcm)
        P = np.concatenate([np.asarray(p) for p in chunks_out])
        out[:, ch] = P[C.HOP:C.HOP + n_samples]
    return out, cfg
