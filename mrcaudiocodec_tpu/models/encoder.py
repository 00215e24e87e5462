"""TPU encoder pipeline: device-resident stages + host bit packing.

Stage structure (SURVEY.md §3.4), designed to minimize host<->device
traffic and synchronization (the axon tunnel makes every byte and every
round trip expensive; on real PCIe hosts the same structure is simply
optimal):

  host:   slice raw padded audio per fixed-size frame chunk (numpy views)
  device: [jit A] frames <- gather, transients, block types, MDCT, psycho
          (audio chunks overlap by one frame so neighbour transients are
          exact; outputs stay ON DEVICE)
  device: [jit B] integer bit-reservoir budget scan over the whole clip
  device: [jit C] batched RD loop per chunk (device-resident inputs)
  host:   ONE compact device->host gather (q int16, amp/bt/cb int8),
          then vectorized Huffman packing (models/packing.py)

All chunk shapes are fixed, so the pipeline compiles to three executables
total regardless of clip length (plus one tiny budget-scan variant per
power-of-two chunk count).
"""
from __future__ import annotations

import functools
import os as _os
import sys as _sys
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import tables as T
from ..config import CodecConfig
from ..ops import dsp, entropy, psycho, rd, reservoir
from ..spec import bitstream as spec_bitstream
from ..spec import entropy as spec_entropy
from ..utils.bits import BitWriter

ENC_CHUNK = int(_os.environ.get("MRC_ENC_CHUNK", 1024))  # frames per executable

_TIMING = bool(_os.environ.get("MRC_DEBUG_TIMING"))


def _tlog(t0, msg):
    if _TIMING:
        print(f"[encode {_time.perf_counter() - t0:7.2f}s] {msg}",
              file=_sys.stderr, flush=True)


def _block_types_dev(tr_ext, window_switching: bool):
    """[..., CHUNK+2] transients (true neighbour edges) -> [..., CHUNK]."""
    tr = tr_ext[..., 1:-1]
    if not window_switching:
        return jnp.zeros(tr.shape, jnp.int32)
    ls = tr_ext[..., :-2]
    rs = tr_ext[..., 2:]
    return jnp.where(
        tr, C.SHORT,
        jnp.where(ls & rs, C.STARTSTOP,
                  jnp.where(ls, C.STOP,
                            jnp.where(rs, C.START, C.LONG)))).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("fs", "window_switching",
                                             "full_psycho", "window"))
def _analyze_chunk(audio_ext, fs, window_switching, full_psycho, window):
    """Row-batched chunk: [R, (CHUNK+3)*HOP] audio -> decision inputs.

    Rows are independent channel-chunks (all channels of one chunk in one
    dispatch — frames of different rows just extend the frame batch axis).
    A 1D input is treated as a single row; 2D outputs carry the row axis
    ([R, CHUNK], [R, CHUNK, ...]).

    audio_ext covers frames [f0-1, f0+CHUNK+1) of the padded signal;
    out-of-clip regions are zeros, which makes edge-frame transients
    exactly False — identical to the spec codec's priming.

    int16 input is converted on device as x / 32768 (exact powers of two:
    bit-identical to the host float path for 16-bit sources, at half the
    upload bytes).
    """
    squeeze = audio_ext.ndim == 1
    if squeeze:
        audio_ext = audio_ext[None]
    with jax.default_matmul_precision("highest"):
        if audio_ext.dtype == jnp.int16:
            audio_ext = audio_ext.astype(jnp.float32) * jnp.float32(
                1.0 / 32768.0)
        r = audio_ext.shape[0]
        chunk_frames = audio_ext.shape[1] // C.HOP - 3
        # 50%-overlap framing WITHOUT a gather (TPU gathers measured ~10 ms
        # per 1024-frame chunk): frame f = hop blocks [f, f+1] of the
        # HOP-strided reshape, i.e. two lane-shifted views concatenated.
        hops = audio_ext.reshape(r, chunk_frames + 3, C.HOP)
        frames_ext = jnp.concatenate(
            [hops[:, :-1, :], hops[:, 1:, :]], axis=-1)   # [R, CHUNK+2, 2048]
        # materialization boundary: without it XLA fuses the framing concat
        # into downstream reductions, whose accumulation order then varies
        # with the surrounding graph — per-clip vs mega-batch paths drifted
        # by 1 ulp and a quantizer floor flipped (tests/test_corpus_parallel)
        frames_ext = jax.lax.optimization_barrier(frames_ext)
        tr_ext = dsp.detect_transients(
            frames_ext.reshape(-1, C.LONG_SIZE)).reshape(r, chunk_frames + 2)
        bt = _block_types_dev(tr_ext, window_switching)   # [R, CHUNK]
        frames = frames_ext[:, 1:-1].reshape(-1, C.LONG_SIZE)
        bt_flat = bt.reshape(-1)
        # N3 (the fused Pallas FFT-stage kernel) dispatches inside
        # dsp.analyze -> ops.dsp._norm_chain: kernel and XLA fallback
        # compute identical normative values, so no flag or shape can
        # silently change the stream (VERDICT r3 task 6).
        coeffs = dsp.analyze(frames, bt_flat, window)
        allowed, pe, _ = psycho.analyze(frames, coeffs, bt_flat, fs,
                                        full_psycho)
        coeffs = coeffs.reshape(r, chunk_frames, -1)
        allowed = allowed.reshape(r, chunk_frames, -1)
        pe = pe.reshape(r, chunk_frames)
    if squeeze:
        return bt[0], coeffs[0], allowed[0], pe[0]
    return bt, coeffs, allowed, pe


@functools.partial(jax.jit,
                   static_argnames=("mean_bits", "cap", "use_reservoir"))
def _budget_stage(pe, nf_real, mean_bits, cap, use_reservoir):
    """[..., nf_pad] device PE + real frame count -> int32 budgets.

    Integer-exact mirror of spec/reservoir.allocate (padding frames have
    pe == 0 and sit after the real frames, so they cannot disturb the
    reservoir chain of real frames). A leading row axis (one reservoir
    chain per channel) is vmapped.
    """
    if not use_reservoir:
        return jnp.full(pe.shape, mean_bits, jnp.int32)

    def one(pe1):
        pe_q = reservoir.quantize_pe(pe1)
        mean_pe = reservoir.mean_pe_exact(pe_q, nf_real)   # int32-safe sum
        desired = reservoir.desired_bits(pe_q, mean_bits, mean_pe)
        budgets, _ = reservoir.budgets_scan(desired, mean_bits, cap)
        return budgets

    return jax.vmap(one)(pe) if pe.ndim == 2 else one(pe)


@functools.partial(jax.jit, static_argnames=("fs",))
def _rd_chunk(coeffs, allowed, budgets, bt, fs):
    """RD + codebook choice; outputs in compact dtypes for the D2H hop.

    Accepts flat [F, ...] inputs or row-batched [R, CHUNK, ...] (rows fold
    into the frame batch axis; outputs keep the row axis).
    """
    lead = coeffs.shape[:-1]
    with jax.default_matmul_precision("highest"):
        q, amp, gain, bits = rd.rd_batch(
            coeffs.reshape(-1, coeffs.shape[-1]),
            allowed.reshape(-1, allowed.shape[-1]),
            budgets.reshape(-1), bt.reshape(-1), fs)
        cb, _ = entropy.payload_costs_and_choice(q, bt.reshape(-1), fs)
    rs = lambda a: a.reshape(lead + a.shape[1:])
    return (rs(q).astype(jnp.int16), rs(amp).astype(jnp.int8),
            rs(gain).astype(jnp.int16), bt.astype(jnp.int8),
            rs(cb).astype(jnp.int8), rs(bits))


def _chunk_schedule(nf: int, base: int | None = None):
    """Cover nf frames with a three-tier chunk ladder (base, /4, /16).

    Bounds zero-padding waste to < base/16 frames while keeping the
    executable count at three sizes per stage (compiled once, cached)."""
    base = ENC_CHUNK if base is None else base
    tiers = [base, max(base // 4, 16), max(base // 16, 16)]
    sizes, rem = [], nf
    for i, t in enumerate(tiers):
        k = rem // t if i < len(tiers) - 1 else -(-rem // t)
        sizes += [t] * k
        rem -= k * t
    return sizes or [tiers[-1]]


def _padded_rows(x: np.ndarray, nf_pad: int):
    """PCM [n, nch] -> padded signal rows [nch, plen]: [2*HOP zeros | x |
    zeros]; frame f spans P[:, (f+1)*HOP : (f+1)*HOP + LONG_SIZE]."""
    n, nch = x.shape
    plen = 2 * C.HOP + nf_pad * C.HOP + 2 * C.HOP + C.LONG_SIZE
    dtype = np.int16 if x.dtype == np.int16 else np.float32
    P = np.zeros((nch, plen), dtype)
    P[:, 2 * C.HOP:2 * C.HOP + n] = x.T
    return P


def _analyze_all(P, sizes, starts, nf, cfg):
    """Dispatch every chunk with all channel rows batched -> per-chunk
    device tuples plus the [nch, nf_pad] budget matrix.

    Per-chunk uploads are ASYNC and overlap the previous chunk's compute
    — load-bearing on the tunnelled PJRT, where H2D throughput
    (~25-50 MB/s measured) makes the audio upload the encode's single
    largest cost: a whole-clip mega-upload measured ~0.13 s SLOWER than
    this pipelined form on the 30 s benchmark clip."""
    chunks = []
    for c in range(len(sizes)):
        lo = int(starts[c]) * C.HOP
        sl = jnp.asarray(P[:, lo:lo + (sizes[c] + 3) * C.HOP])
        chunks.append(_analyze_chunk(
            sl, cfg.fs, cfg.window_switching, cfg.full_psycho, cfg.window))
    pes = [ch[3] for ch in chunks]
    pe_full = pes[0] if len(pes) == 1 else jnp.concatenate(pes, axis=1)
    budgets = _budget_stage(pe_full, jnp.int32(nf), int(cfg.mean_frame_bits),
                            cfg.reservoir_cap, cfg.reservoir)
    return chunks, budgets


def encode_arrays(x: np.ndarray, cfg: CodecConfig):
    """PCM [n, ch] -> dict of numpy decision arrays [nch, nf, ...], nf.

    All channels of a chunk run as ONE device dispatch (channel rows fold
    into the frame batch axis), so a stereo clip costs the same dispatch
    count as mono and each executable sees twice the batch.
    """
    t0 = _time.perf_counter()
    n, nch = x.shape
    nf = cfg.frames_for_samples(n)
    sizes = _chunk_schedule(nf)
    n_chunks = len(sizes)
    starts = np.concatenate([[0], np.cumsum(sizes)]).astype(int)

    P = _padded_rows(x, int(starts[-1]))
    chunks, budgets = _analyze_all(P, sizes, starts, nf, cfg)
    outs = []
    for c in range(n_chunks):
        bt, co, al, _ = chunks[c]
        b = budgets[:, int(starts[c]):int(starts[c + 1])]
        o = _rd_chunk(co, al, b, bt, cfg.fs)
        for a in o:              # overlap D2H with later chunks' compute
            a.copy_to_host_async()
        outs.append(o)
    _tlog(t0, f"dispatched {n_chunks} row-batched chunks {sizes}")

    # ONE synchronizing gather of the compact decision arrays.
    host = jax.device_get(outs)
    _tlog(t0, "device_get done")
    dec = {}
    for key, i in (("q", 0), ("amp", 1), ("gain", 2), ("bt", 3), ("cb", 4)):
        arr = np.concatenate([np.asarray(host[c][i])
                              for c in range(n_chunks)], axis=1)[:, :nf]
        dec[key] = arr.astype(np.int32)
    _tlog(t0, "decisions assembled")
    return dec, nf


def pack_stream(dec, nf: int, n_samples: int, cfg: CodecConfig) -> bytes:
    """Reference per-frame packer (slow; kept as the packing test oracle)."""
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


DEVICE_PACK = _os.environ.get("MRC_DEVICE_PACK", "1") != "0"


@functools.partial(jax.jit, static_argnames=("fs", "cap"))
def _rd_pack_chunk(coeffs, allowed, budgets, bt, fs, cap):
    """Merged RD + codebook choice + on-device record packing: one
    executable, one launch (launch latency on the tunnelled PJRT is the
    encode's dominant cost — see bench.py kernel notes)."""
    from ..ops.device_pack import pack_records_device
    lead = coeffs.shape[:-1]
    with jax.default_matmul_precision("highest"):
        q, amp, gain, bits = rd.rd_batch(
            coeffs.reshape(-1, coeffs.shape[-1]),
            allowed.reshape(-1, allowed.shape[-1]),
            budgets.reshape(-1).astype(jnp.int32), bt.reshape(-1), fs)
        cb, _ = entropy.payload_costs_and_choice(q, bt.reshape(-1), fs)
        rec, nbytes = pack_records_device(q, amp, gain, bt.reshape(-1),
                                          cb, fs, cap)
    return (rec.reshape(lead + rec.shape[1:]),
            nbytes.reshape(lead))


def encode_device_packed(x: np.ndarray, cfg: CodecConfig) -> bytes:
    """Fully device-side encode: the bitstream bytes themselves are built
    on the TPU (ops/device_pack.py); only ~compressed-size bytes cross back
    to the host, which merely concatenates record runs. Per chunk: one
    async upload, one analyze launch, one merged rd+pack launch — uploads
    pipeline with compute (see _analyze_all)."""
    from ..ops.device_pack import record_cap_bytes

    t0 = _time.perf_counter()
    n, nch = x.shape
    nf = cfg.frames_for_samples(n)
    sizes = _chunk_schedule(nf)
    n_chunks = len(sizes)
    starts = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    cap = record_cap_bytes(cfg)

    P = _padded_rows(x, int(starts[-1]))
    chunks, budgets = _analyze_all(P, sizes, starts, nf, cfg)
    outs = []
    for c in range(n_chunks):
        bt, co, al, _ = chunks[c]
        b = budgets[:, int(starts[c]):int(starts[c + 1])]
        rec, nbytes = _rd_pack_chunk(co, al, b, bt, cfg.fs, cap)
        rec.copy_to_host_async()
        nbytes.copy_to_host_async()
        outs.append((rec, nbytes))
    _tlog(t0, f"dispatched {n_chunks} row-batched chunks (device pack)")

    host = jax.device_get(outs)
    _tlog(t0, "device_get done")
    rec = np.concatenate([np.asarray(host[c][0]) for c in range(n_chunks)],
                         axis=1)[:, :nf]            # [nch, nf, cap]
    nbytes = np.concatenate([np.asarray(host[c][1])
                             for c in range(n_chunks)],
                            axis=1)[:, :nf].astype(np.int64)
    # channel-interleave record runs: order (f, ch)
    rec = np.swapaxes(rec, 0, 1).reshape(nf * nch, cap)
    nbytes = np.swapaxes(nbytes, 0, 1).reshape(nf * nch)
    from ..native import _ranges
    idx = np.repeat(np.arange(nf * nch) * cap, nbytes) + _ranges(nbytes)
    body = rec.reshape(-1)[idx].tobytes()

    w = BitWriter()
    spec_bitstream.write_header(w, cfg, nf, n)
    out = w.getvalue() + body
    _tlog(t0, "assembled")
    return out


def encode(x: np.ndarray, cfg: CodecConfig) -> bytes:
    """PCM [n] or [n, channels], float32 in [-1,1] or raw int16 -> MRC1
    bytes (TPU path). int16 input skips the host float conversion and
    uploads half the bytes."""
    x = np.asarray(x)
    if x.dtype != np.int16:
        x = x.astype(np.float32)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[1] != cfg.channels:
        raise ValueError(
            f"config expects {cfg.channels} channels, got {x.shape[1]}")
    if DEVICE_PACK:
        return encode_device_packed(x, cfg)
    t0 = _time.perf_counter()
    dec, nf = encode_arrays(x, cfg)
    from .packing import pack_stream as pack_fast
    out = pack_fast(dec, nf, x.shape[0], cfg)
    _tlog(t0, "packed")
    return out
