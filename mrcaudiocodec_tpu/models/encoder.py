"""TPU encoder pipeline: batched JAX front-end + host bit packing.

Stage structure (SURVEY.md §3.4):
  host:   framing (numpy views)
  device: [jit] transient detect -> block types -> MDCT -> psycho -> PE
  host:   bit-reservoir budget allocation (int64-exact, tiny)
  device: [jit] batched RD loop (chunked over frames for HBM headroom)
  host:   Huffman symbol emission + vectorized bit packing

The two jitted stages are shape-static: frames are processed in fixed-size
chunks (padded), so XLA compiles exactly two executables regardless of clip
length.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import tables as T
from ..config import CodecConfig
from ..ops import dsp, entropy, psycho, quantize, rd
from ..spec import bitstream as spec_bitstream
from ..spec import entropy as spec_entropy
from ..spec import reservoir as spec_reservoir
from ..utils.bits import BitWriter

RD_CHUNK = 256          # frames per RD jit call (bounds [F,32,1024] temps)
ANALYZE_CHUNK = 1024    # frames per analyze jit call

# Both stages run on fixed-size chunks (zero-padded) so each compiles to ONE
# executable regardless of clip length — essential on the axon-tunnelled TPU
# where a fresh compile costs 5-150 s (SURVEY.md §2b).


@jax.jit
def _transient_stage(frames):
    return dsp.detect_transients(frames)


@functools.partial(jax.jit, static_argnames=("fs", "full_psycho", "window"))
def _analyze_stage(frames, bt, fs, full_psycho, window):
    # HIGHEST keeps f32 matmul fidelity on the MXU (default would round
    # through bfloat16 and diverge from the NumPy spec codec)
    with jax.default_matmul_precision("highest"):
        coeffs = dsp.analyze(frames, bt, window)
        allowed, pe, _ = psycho.analyze(frames, coeffs, bt, fs, full_psycho)
    return coeffs, allowed, pe


@functools.partial(jax.jit, static_argnames=("fs",))
def _rd_stage(coeffs, allowed, budgets, bt, fs):
    with jax.default_matmul_precision("highest"):
        q, amp, gain, bits = rd.rd_batch(coeffs, allowed, budgets, bt, fs)
        cb, _ = entropy.payload_costs_and_choice(q, bt, fs)
    return q, amp, gain, bits, cb


def encode_arrays(x: np.ndarray, cfg: CodecConfig):
    """PCM [n, ch] -> per-channel dict of numpy decision arrays.

    Returns (decisions, nf) where decisions[ch] has q, amp, gain, bt.
    """
    n, nch = x.shape
    nf = cfg.frames_for_samples(n)

    # Host framing per channel, then batch channels on the frame axis.
    frames = np.stack([dsp.frame_signal(x[:, ch]) for ch in range(nch)])
    frames = frames.reshape(nch * nf, C.LONG_SIZE)
    total = nch * nf

    def chunks(n, size):
        pos = 0
        while pos < n:
            yield pos, min(pos + size, n)
            pos += size

    # Transients per frame (independent), then block types per channel on
    # the host (the neighbour logic must not cross channel boundaries).
    tr_l = []
    for lo, hi in chunks(total, ANALYZE_CHUNK):
        fchunk = np.pad(frames[lo:hi], ((0, ANALYZE_CHUNK - (hi - lo)), (0, 0)))
        tr_l.append(np.asarray(_transient_stage(jnp.asarray(fchunk))[:hi - lo]))
    tr = np.concatenate(tr_l).reshape(nch, nf)
    from ..spec.dsp import block_types as host_block_types
    bt = np.stack([host_block_types(tr[ch], cfg.window_switching)
                   for ch in range(nch)]).reshape(total)

    co_l, al_l, pe_l = [], [], []
    for lo, hi in chunks(total, ANALYZE_CHUNK):
        pad = ANALYZE_CHUNK - (hi - lo)
        fchunk = np.pad(frames[lo:hi], ((0, pad), (0, 0)))
        btc = np.pad(bt[lo:hi], (0, pad))
        coc, alc, pec = _analyze_stage(
            jnp.asarray(fchunk), jnp.asarray(btc), cfg.fs,
            cfg.full_psycho, cfg.window)
        co_l.append(np.asarray(coc[:hi - lo]))
        al_l.append(np.asarray(alc[:hi - lo]))
        pe_l.append(np.asarray(pec[:hi - lo]))
    coeffs = np.concatenate(co_l)
    allowed = np.concatenate(al_l)
    pe_np = np.concatenate(pe_l).reshape(nch, nf)
    budgets = np.stack([spec_reservoir.allocate(pe_np[ch], cfg)
                        for ch in range(nch)]).astype(np.int32)
    budgets_dev = jnp.asarray(budgets.reshape(nch * nf))

    # RD in fixed-size chunks.
    total = nch * nf
    outs = {k: [] for k in ("q", "amp", "gain", "bt")}
    for lo in range(0, total, RD_CHUNK):
        hi = min(lo + RD_CHUNK, total)
        pad = RD_CHUNK - (hi - lo)
        sl = slice(lo, hi)
        c = jnp.pad(coeffs[sl], ((0, pad), (0, 0)))
        a = jnp.pad(allowed[sl], ((0, pad), (0, 0)))
        b = jnp.pad(budgets_dev[sl], (0, pad),
                    constant_values=int(cfg.mean_frame_bits))
        t = jnp.pad(bt[sl], (0, pad))
        q, amp, gain, bits, cb = _rd_stage(c, a, b, t, cfg.fs)
        outs["q"].append(np.asarray(q[:hi - lo]))
        outs["amp"].append(np.asarray(amp[:hi - lo]))
        outs["gain"].append(np.asarray(gain[:hi - lo]))
        outs["bt"].append(np.asarray(t[:hi - lo]))
    dec = {k: np.concatenate(v).reshape((nch, nf) + v[0].shape[1:])
           for k, v in outs.items()}
    return dec, nf


def pack_stream(dec, nf: int, n_samples: int, cfg: CodecConfig) -> bytes:
    """Decision arrays -> MRC1 byte stream (host phase-b packing)."""
    nch = cfg.channels
    w = BitWriter()
    spec_bitstream.write_header(w, cfg, nf, n_samples)
    for f in range(nf):
        for ch in range(nch):
            codes, lens = spec_entropy.encode_frame_symbols(
                dec["q"][ch, f], dec["amp"][ch, f], int(dec["gain"][ch, f]),
                int(dec["bt"][ch, f]), cfg.fs)
            content = int(sum(lens))
            w.write(content, C.FRAME_LEN_BITS)
            for c, l in zip(codes, lens):
                w.write(c, l)
            w.align()
    return w.getvalue()


def encode(x: np.ndarray, cfg: CodecConfig) -> bytes:
    """PCM [n] or [n, channels] float32 -> MRC1 bytes (TPU path)."""
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[1] != cfg.channels:
        raise ValueError(
            f"config expects {cfg.channels} channels, got {x.shape[1]}")
    dec, nf = encode_arrays(x, cfg)
    from .packing import pack_stream as pack_fast
    return pack_fast(dec, nf, x.shape[0], cfg)
