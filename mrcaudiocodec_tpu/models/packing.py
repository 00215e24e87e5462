"""Vectorized MRC1 stream packing (SURVEY.md §2b N6 phase-b).

Builds the entire file's (codeword, bitlength) sequence as flat numpy
arrays — no per-frame Python loop — and scatters it into bytes with one
`pack_codes` call. Emission order per record matches spec/entropy.py
exactly (verified by tests/test_packing.py byte-equality).

Slot grid per record (zero-length slots are skipped by pack_codes):
  [len prefix][block type][gain][cb id x NB][sf delta x NB]
  [per pair p in 0..511: main code | sign a | sign b | esc a | esc b]
  [byte-align pad]
"""
from __future__ import annotations

import numpy as np

from .. import config as C
from .. import tables as T
from ..config import CodecConfig
from ..spec import bitstream as spec_bitstream
from ..utils.bits import BitWriter, pack_codes


def _payload_slots(q: np.ndarray, cb_bin: np.ndarray):
    """Per-pair emission slots.

    q: [R, 1024] int, cb_bin: [R, 1024] codebook id per bin.
    Returns codes[R, 512, 5] uint32, lens[R, 512, 5] int64.
    """
    ca = T.code_arrays()
    r = q.shape[0]
    qp = q.reshape(r, 512, 2)
    cbp = cb_bin.reshape(r, 512, 2)[:, :, 0]      # cb constant within pair
    aq = np.abs(qp)

    codes = np.zeros((r, 512, 5), np.uint64)
    lens = np.zeros((r, 512, 5), np.int64)

    # --- CB_SMALL: one 4-tuple codeword on even pairs
    q4 = np.clip(q.reshape(r, 256, 4), -1, 1) + 1
    sym1 = ((q4[..., 0] * 3 + q4[..., 1]) * 3 + q4[..., 2]) * 3 + q4[..., 3]
    is1 = cbp[:, ::2] == C.CB_SMALL               # [R, 256]
    codes[:, ::2, 0] = np.where(is1, ca["codes_small"][sym1], 0)
    lens[:, ::2, 0] = np.where(is1, ca["len_small"][sym1], 0)

    # --- CB_MID: pair codeword
    q2 = np.clip(qp, -4, 4) + 4
    sym2 = q2[..., 0] * 9 + q2[..., 1]
    is2 = cbp == C.CB_MID
    codes[..., 0] = np.where(is2, ca["codes_mid"][sym2], codes[..., 0])
    lens[..., 0] = np.where(is2, ca["len_mid"][sym2], lens[..., 0])

    # --- CB_ESC: pair magnitude codeword + signs + escapes
    m2 = np.minimum(aq, C.ESC_MAG)
    sym3 = m2[..., 0] * (C.ESC_MAG + 1) + m2[..., 1]
    is3 = cbp == C.CB_ESC
    codes[..., 0] = np.where(is3, ca["codes_esc"][sym3], codes[..., 0])
    lens[..., 0] = np.where(is3, ca["len_esc"][sym3], lens[..., 0])
    for i in (0, 1):
        nz = is3 & (qp[..., i] != 0)
        codes[..., 1 + i] = np.where(nz, (qp[..., i] < 0).astype(np.uint64), 0)
        lens[..., 1 + i] = np.where(nz, 1, 0)
        mag = aq[..., i]
        esc = is3 & (mag >= C.ESC_MAG)
        e = np.zeros_like(mag)
        mm = np.maximum(mag, 1)
        e = np.floor(np.log2(mm)).astype(np.int64)
        # combined escape word: (e-4) ones, a zero, e bits of (m - 2^e)
        word = ((((np.uint64(1) << (e - 4).clip(0).astype(np.uint64))
                  - np.uint64(1))
                 << (e + 1).clip(0).astype(np.uint64))
                | (mag - (np.int64(1) << e.clip(0))).clip(0).astype(np.uint64))
        codes[..., 3 + i] = np.where(esc, word, 0)
        lens[..., 3 + i] = np.where(esc, 2 * e - 3, 0)
    return codes, lens


def pack_records(q, amp, gain, bt, fs: int, cb=None):
    """Decision arrays -> (codes, lens) flat arrays for all records.

    q: [R, 1024], amp: [R, NB], gain: [R], bt: [R]. Records are emitted in
    array order; the caller interleaves channels by ordering R. `cb` is the
    per-band codebook choice; recomputed with the spec rule if omitted.
    """
    ca = T.code_arrays()
    lay = T.unified_layout(fs)
    r, nb = amp.shape
    width = lay["width"][bt]                      # [R, NB]
    real = width > 0
    bin_band = lay["bin_band"][bt]                # [R, 1024]

    if cb is None:
        # codebook choice per band (same integer rule as spec/ops); the
        # spec chooser takes one edges table, so group records by type
        from ..spec import entropy as se
        cb = np.zeros((r, nb), np.int32)
        for t in np.unique(bt):
            sel = bt == t
            cb_t, _ = se.choose_codebooks(q[sel], lay["edges"][t],
                                          lay["width"][t])
            cb[sel] = cb_t

    # --- header slots: [bt, gain]
    head_codes = np.stack([bt.astype(np.uint64), gain.astype(np.uint64)],
                          axis=1)
    head_lens = np.broadcast_to(
        np.array([C.BLOCK_TYPE_BITS, C.GAIN_BITS], np.int64), (r, 2))

    # --- cb id slots
    cb_codes = np.where(real, cb, 0).astype(np.uint64)
    cb_lens = np.where(real, C.CB_BITS, 0).astype(np.int64)

    # --- sf delta slots
    a = np.where(real, amp, 0)
    prev = np.concatenate([np.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
    delta = (prev - a) + C.SF_DELTA_MAX
    sf_codes = np.where(real, ca["codes_sf"][delta], 0).astype(np.uint64)
    sf_lens = np.where(real, ca["len_sf"][delta], 0).astype(np.int64)

    # --- payload slots
    cb_bin = np.take_along_axis(cb, bin_band, axis=1)     # [R, 1024]
    pay_codes, pay_lens = _payload_slots(q, cb_bin)
    pay_codes = pay_codes.reshape(r, -1)
    pay_lens = pay_lens.reshape(r, -1)

    codes = np.concatenate([head_codes, cb_codes, sf_codes, pay_codes],
                           axis=1)
    lens = np.concatenate([head_lens, cb_lens, sf_lens, pay_lens], axis=1)

    # --- length prefix + byte-align pad
    content = lens.sum(axis=1)
    pad = (-(C.FRAME_LEN_BITS + content)) % 8
    codes = np.concatenate([content[:, None].astype(np.uint64), codes,
                            np.zeros((r, 1), np.uint64)], axis=1)
    lens = np.concatenate([np.full((r, 1), C.FRAME_LEN_BITS, np.int64), lens,
                           pad[:, None]], axis=1)
    return codes.reshape(-1), lens.reshape(-1)


def pack_stream(dec, nf: int, n_samples: int, cfg: CodecConfig) -> bytes:
    """Vectorized equivalent of models.encoder.pack_stream."""
    nch = cfg.channels
    # interleave channels: record order (f, ch)
    def interleave(x):
        # x: [nch, nf, ...] -> [nf * nch, ...]
        return np.swapaxes(np.asarray(x), 0, 1).reshape(
            (nf * nch,) + x.shape[2:])
    cb = interleave(dec["cb"]) if "cb" in dec else None
    w = BitWriter()
    spec_bitstream.write_header(w, cfg, nf, n_samples)
    header = w.getvalue()
    from .. import native
    if cb is not None and native.available():
        packed = native.pack_records_native(
            interleave(dec["q"]).astype(np.int16),
            interleave(dec["amp"]).astype(np.int8),
            interleave(dec["gain"]).astype(np.int16),
            interleave(dec["bt"]).astype(np.int8),
            cb.astype(np.int8), cfg.fs)
        if packed is not None:
            return header + packed
    codes, lens = pack_records(interleave(dec["q"]), interleave(dec["amp"]),
                               interleave(dec["gain"]), interleave(dec["bt"]),
                               cfg.fs, cb=cb)
    packed = native.pack_codes_native(codes, lens)
    if packed is None:
        packed = pack_codes(codes, lens)
    return header + packed
