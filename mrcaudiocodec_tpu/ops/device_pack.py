"""On-device bitstream packing (SURVEY.md §2b N6 phase-b, device variant).

Builds every frame record's bytes ON the TPU: slot-grid codeword/length
computation (masked-sum codeword lookups — no gathers), per-record
exclusive bit-offset scan, and byte assembly as a fused
broadcast-compare-reduce "scatter by offset" (BASELINE.json:5 "on-device
scatter-by-offset"). The host then just concatenates each record's
`rec_bytes` run — device->host traffic shrinks to roughly the compressed
file size.

Slot grid per record (mirrors models/packing.py exactly):
  [0]            20-bit length prefix
  [1..2]         block type (3), gain (8)
  [3 .. 3+NB)    cb ids (2 bits, real bands)
  [.. +NB)       sf delta codewords
  [.. +512*5)    per pair: main | sign a | sign b | esc a | esc b
(no explicit pad slot: bytes beyond the content are zero by construction)

Byte-exactness vs the host packers is asserted in tests/test_device_pack.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import tables as T
from .entropy import _select_by_bt, escape_bits, lut

I32 = jnp.int32
U32 = jnp.uint32


def _lut_pair(codes_tab: np.ndarray, len_tab: np.ndarray, sym):
    """(codeword, length) lookup via one fused masked-sum pass each."""
    return lut(codes_tab.astype(np.int64), sym), lut(len_tab, sym)


def _slots(q, amp, gain, bt, cb, fs: int):
    """Decision arrays -> (codes [F,S] i32, lens [F,S] i32), slot-major.

    Matches models/packing.pack_records emission order; codeword values fit
    in 25 bits (max code 20 + escape words 2e-3 <= 19 with value <= 2^11).
    """
    ca = T.code_arrays()
    lay = T.unified_layout(fs)
    nb = lay["nb"]
    f = q.shape[0]
    width = _select_by_bt(lay["width"], bt)               # [F, NB]
    real = width > 0

    # header slots
    h_codes = jnp.stack([bt.astype(I32), gain.astype(I32)], axis=1)
    h_lens = jnp.broadcast_to(
        jnp.asarray([C.BLOCK_TYPE_BITS, C.GAIN_BITS], I32), (f, 2))

    # cb ids
    cb_codes = jnp.where(real, cb, 0).astype(I32)
    cb_lens = jnp.where(real, C.CB_BITS, 0).astype(I32)

    # sf deltas
    a = jnp.where(real, amp.astype(I32), 0)
    prev = jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
    delta = (prev - a) + C.SF_DELTA_MAX
    sfc, sfl = _lut_pair(ca["codes_sf"], ca["len_sf"], delta)
    sf_codes = jnp.where(real, sfc, 0).astype(I32)
    sf_lens = jnp.where(real, sfl, 0)

    # payload: per-pair 5-slot grid
    bin_band = lay["bin_band"]
    cb_bin = jnp.einsum("fn,fin->fi", cb.astype(jnp.bfloat16),
                        _select_by_bt(lay["band_mask"],
                                      bt).astype(jnp.bfloat16),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32).astype(I32)
    del bin_band
    qp = q.astype(I32).reshape(f, 512, 2)
    cbp = cb_bin.reshape(f, 512, 2)[:, :, 0]
    aq = jnp.abs(qp)

    pay_codes = jnp.zeros((f, 512, 5), I32)
    pay_lens = jnp.zeros((f, 512, 5), I32)

    # CB_SMALL 4-tuples on even pairs
    q4 = jnp.clip(q.astype(I32).reshape(f, 256, 4), -1, 1) + 1
    sym1 = ((q4[..., 0] * 3 + q4[..., 1]) * 3 + q4[..., 2]) * 3 + q4[..., 3]
    c1, l1 = _lut_pair(ca["codes_small"], ca["len_small"], sym1)
    is1 = cbp[:, ::2] == C.CB_SMALL
    pay_codes = pay_codes.at[:, ::2, 0].set(jnp.where(is1, c1, 0))
    pay_lens = pay_lens.at[:, ::2, 0].set(jnp.where(is1, l1, 0))

    # CB_MID pairs
    q2 = jnp.clip(qp, -4, 4) + 4
    sym2 = q2[..., 0] * 9 + q2[..., 1]
    c2, l2 = _lut_pair(ca["codes_mid"], ca["len_mid"], sym2)
    is2 = cbp == C.CB_MID
    pay_codes = pay_codes.at[..., 0].add(jnp.where(is2, c2, 0))
    pay_lens = pay_lens.at[..., 0].add(jnp.where(is2, l2, 0))

    # CB_ESC pairs + signs + escapes
    m2 = jnp.minimum(aq, C.ESC_MAG)
    sym3 = m2[..., 0] * (C.ESC_MAG + 1) + m2[..., 1]
    c3, l3 = _lut_pair(ca["codes_esc"], ca["len_esc"], sym3)
    is3 = cbp == C.CB_ESC
    pay_codes = pay_codes.at[..., 0].add(jnp.where(is3, c3, 0))
    pay_lens = pay_lens.at[..., 0].add(jnp.where(is3, l3, 0))
    for i in (0, 1):
        nz = is3 & (qp[..., i] != 0)
        pay_codes = pay_codes.at[..., 1 + i].set(
            jnp.where(nz, (qp[..., i] < 0).astype(I32), 0))
        pay_lens = pay_lens.at[..., 1 + i].set(jnp.where(nz, 1, 0))
        mag = aq[..., i]
        esc = is3 & (mag >= C.ESC_MAG)
        e = jnp.full(mag.shape, 4, I32)
        for k in range(5, 13):
            e = e + (mag >= (1 << k)).astype(I32)
        # combined escape word: (e-4) ones, a zero, e bits of (m - 2^e)
        ones = (jnp.left_shift(1, jnp.maximum(e - 4, 0)) - 1)
        word = jnp.left_shift(ones, e + 1) | (mag - jnp.left_shift(1, e))
        pay_codes = pay_codes.at[..., 3 + i].set(jnp.where(esc, word, 0))
        pay_lens = pay_lens.at[..., 3 + i].set(
            jnp.where(esc, 2 * e - 3, 0))

    codes = jnp.concatenate(
        [h_codes, cb_codes, sf_codes, pay_codes.reshape(f, -1)], axis=1)
    lens = jnp.concatenate(
        [h_lens, cb_lens, sf_lens, pay_lens.reshape(f, -1)], axis=1)
    # prepend the 20-bit length prefix
    content = lens.sum(axis=1)
    codes = jnp.concatenate([content[:, None], codes], axis=1)
    lens = jnp.concatenate(
        [jnp.full((f, 1), C.FRAME_LEN_BITS, I32), lens], axis=1)
    return codes, lens, content


def _assemble_bytes(codes, lens, cap_bytes: int, byte_block: int = 64):
    """codes/lens [F, S] -> record bytes [F, cap_bytes] uint8.

    Fused 'scatter by offset': every slot contributes to <= 4 bytes; the
    per-byte sum runs as a broadcast-compare-reduce over slots, blocked
    over the byte axis to bound the fused intermediate.
    """
    f, s = codes.shape
    offs = jnp.cumsum(lens, axis=1) - lens                # exclusive [F, S]
    end = offs + lens                                     # bit end per slot
    first_byte = offs >> 3
    # k-th spanned byte of slot: j = first_byte + k, k in 0..3
    out = []
    nowhere = cap_bytes + 1
    parts = []
    for k in range(4):
        j = first_byte + k
        sh = end - 8 * (j + 1)       # code bits beyond byte j's end
        pos = jnp.where(sh >= 0,
                        jnp.right_shift(codes, jnp.maximum(sh, 0)),
                        jnp.left_shift(codes, jnp.maximum(-sh, 0))) & 255
        valid = (lens > 0) & (8 * j < end)
        parts.append((jnp.where(valid, j, nowhere), jnp.where(valid, pos, 0)))
    for b0 in range(0, cap_bytes, byte_block):
        blk = min(byte_block, cap_bytes - b0)
        biota = jnp.arange(b0, b0 + blk, dtype=I32)[None, None, :]
        acc = jnp.zeros((f, blk), jnp.float32)
        for j, val in parts:
            acc = acc + jnp.sum(
                val.astype(jnp.float32)[:, :, None]
                * (j[:, :, None] == biota), axis=1)
        out.append(acc.astype(jnp.uint8))
    return jnp.concatenate(out, axis=1)


def record_cap_bytes(cfg) -> int:
    """Static per-config upper bound on a record's total bytes."""
    mean_bits = int(cfg.mean_frame_bits)
    hi = int(mean_bits * (1.0 + C.RESERVOIR_MAX_WITHDRAW))
    return (C.FRAME_LEN_BITS + hi) // 8 + 2


@functools.partial(jax.jit, static_argnames=("fs", "cap_bytes"))
def pack_records_device(q, amp, gain, bt, cb, fs, cap_bytes):
    """Decision arrays -> (rec_bytes [F, cap] u8, rec_nbytes [F] i32)."""
    codes, lens, content = _slots(q.astype(I32), amp.astype(I32),
                                  gain.astype(I32), bt.astype(I32),
                                  cb.astype(I32), fs)
    rec = _assemble_bytes(codes, lens, cap_bytes)
    nbytes = (C.FRAME_LEN_BITS + content + 7) // 8
    return rec, nbytes
