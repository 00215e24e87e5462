"""Sharded encode: DP over clips x sequence-parallel over the frame axis.

This is the codec's long-context machinery (SURVEY.md §2b N7/N8/N9, §5):

* N7 data parallelism: independent clips on the 'data' mesh axis — no
  communication at all.
* N8 frame-axis sharding: each 'seq' shard owns a contiguous run of frames
  of one clip. The 50%-overlap MDCT needs the previous shard's last HOP
  samples — ONE `ppermute` halo exchange of 1024 samples per clip, the
  codec's analog of ring/blockwise context parallelism (no attention here,
  SURVEY.md §2b N10). Window-switch lookahead exchanges two booleans.
* N9 bit-reservoir state: the per-frame budget chain is a clamped-add
  monoid scan (ops/reservoir.py). Each shard composes its local maps, an
  `all_gather` of S tiny (3-int) composed maps provides every shard its
  incoming reservoir level, and budgets are then evaluated locally —
  sequential semantics, parallel execution.

The invariant tested in tests/test_sharded.py: sharded output ==
unsharded output, decision-for-decision.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .. import config as C
from .. import tables as T
from ..ops import dsp, entropy, psycho, quantize, rd, reservoir

I32 = jnp.int32


def _block_types_sharded(tr, tr_prev_last, tr_next_first, window_switching):
    """Mirror of ops.dsp.block_types with cross-shard boundary flags."""
    if not window_switching:
        return jnp.zeros(tr.shape, dtype=I32)
    ls = jnp.concatenate([tr_prev_last[None], tr[:-1]])
    rs = jnp.concatenate([tr[1:], tr_next_first[None]])
    bt = jnp.where(
        tr, C.SHORT,
        jnp.where(ls & rs, C.STARTSTOP,
                  jnp.where(ls, C.STOP, jnp.where(rs, C.START, C.LONG))))
    return bt.astype(I32)


def _shard_encode_body(xp, nf_row, cfg, total_frames: int, axis: str = "seq",
                       pack_cap: int | None = None):
    """Per-shard encode body (runs inside shard_map).

    xp: [B_loc, F_loc * HOP] — this shard's contiguous chunk of the padded
    signal (global layout: [zeros(HOP) | x | zeros] with the leading
    priming hop NOT included; it materializes as shard 0's zero halo).
    nf_row: [B_loc] int32 — each row's TRUE frame count (rows may carry
    tail padding up to total_frames so mixed-length clips share one
    executable; see corpus._encode_batch_fused). Pad frames are all-zero
    by construction, so transients/block types of real frames are
    unaffected; the ONLY whole-clip quantity is the reservoir's mean PE,
    which masks pad frames and divides by nf_row — making every real
    frame's budget (and hence the stream) byte-identical to encoding the
    unpadded clip alone (tests/test_corpus_parallel.py).
    Returns per-local-frame decision arrays.
    """
    naxis = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    b_loc = xp.shape[0]
    f_loc = xp.shape[1] // C.HOP

    # --- N8 halo exchange: previous shard's last HOP samples
    right = [(i, (i + 1) % naxis) for i in range(naxis)]
    halo = jax.lax.ppermute(xp[:, -C.HOP:], axis, right)
    halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)   # priming zeros

    ext = jnp.concatenate([halo, xp], axis=1)       # [B, (F_loc+1)*HOP]
    if ext.dtype == jnp.int16:
        # 16-bit sources ride the upload + halo exchange as int16 and are
        # converted on device (exact /32768 — tests/test_int16_path.py)
        ext = ext.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    # gather-free 50%-overlap framing (same trick as models/encoder):
    # frame f = hop blocks [f, f+1] of the HOP-strided reshape
    hops = ext.reshape(b_loc, f_loc + 1, C.HOP)
    frames = jnp.concatenate([hops[:, :-1, :], hops[:, 1:, :]],
                             axis=-1)               # [B, F_loc, 2048]
    frames = jax.lax.optimization_barrier(frames)   # see models/encoder.py
    frames = frames.reshape(b_loc * f_loc, C.LONG_SIZE)

    # --- transient detect + boundary flag exchange
    tr = dsp.detect_transients(frames).reshape(b_loc, f_loc)
    tr_prev_last = jax.lax.ppermute(tr[:, -1], axis, right)
    tr_prev_last = jnp.where(idx == 0, False, tr_prev_last)
    left = [(i, (i - 1) % naxis) for i in range(naxis)]
    tr_next_first = jax.lax.ppermute(tr[:, 0], axis, left)
    tr_next_first = jnp.where(idx == naxis - 1, False, tr_next_first)

    bt = jax.vmap(_block_types_sharded, in_axes=(0, 0, 0, None))(
        tr, tr_prev_last, tr_next_first, cfg.window_switching)
    bt = bt.reshape(b_loc * f_loc)

    # --- analysis + psycho (local, batched)
    coeffs = dsp.analyze(frames, bt, cfg.window)
    allowed, pe, _ = psycho.analyze(frames, coeffs, bt, cfg.fs,
                                    cfg.full_psycho)

    # --- N9 reservoir: global mean PE + cross-shard scan of clamped-add maps
    mean_bits = int(cfg.mean_frame_bits)
    if cfg.reservoir:
        pe_q = reservoir.quantize_pe(pe).reshape(b_loc, f_loc)
        # mask tail-pad frames out of the whole-clip mean-PE sum (their PE
        # is already ~0 for silence, but the DENOMINATOR must be nf_row)
        gidx = idx * f_loc + jnp.arange(f_loc, dtype=I32)    # [F_loc]
        pe_q = jnp.where(gidx[None, :] < nf_row[:, None], pe_q, 0)
        hi_l, lo_l = reservoir.split_pe_sums(pe_q, axis=1)  # [B] each
        hi_g = jax.lax.psum(hi_l, axis)
        lo_g = jax.lax.psum(lo_l, axis)
        mean_pe = reservoir.mean_pe_from_sums(hi_g, lo_g,
                                              nf_row)       # [B]
        desired = reservoir.desired_bits(
            pe_q, mean_bits, mean_pe[:, None])              # [B, F_loc]
        cap = cfg.reservoir_cap
        a = (mean_bits - desired).astype(I32)
        lo = jnp.zeros_like(a)
        hi = jnp.full_like(a, cap)
        pref = jax.lax.associative_scan(
            reservoir._compose, (a, lo, hi), axis=1)        # local inclusive
        shard_map_total = tuple(x[:, -1] for x in pref)     # [B] x3
        gathered = jax.lax.all_gather(shard_map_total, axis)  # [S, B] x3
        # carry-in for this shard: compose maps of shards < idx
        def carry_for(shard_maps):
            def step(carry, s):
                m = tuple(g[s] for g in shard_maps)
                new = reservoir._compose(carry, m)
                use = s < idx
                return tuple(jnp.where(use, n, c)
                             for n, c in zip(new, carry)), None
            ident = (jnp.zeros((b_loc,), I32),
                     jnp.full((b_loc,), -(1 << 30), I32),
                     jnp.full((b_loc,), (1 << 30), I32))
            carry, _ = jax.lax.scan(step, ident, jnp.arange(naxis))
            return carry
        carry_in = carry_for(gathered)
        r_in = reservoir._apply(carry_in, jnp.zeros((b_loc,), I32))  # [B]
        # r at local frame i = apply(local exclusive prefix, r_in);
        # identity map = (0, -INF, +INF)
        ident_cols = (jnp.zeros((b_loc, 1), I32),
                      jnp.full((b_loc, 1), -(1 << 30), I32),
                      jnp.full((b_loc, 1), (1 << 30), I32))
        excl = tuple(jnp.concatenate([icol, x[:, :-1]], axis=1)
                     for icol, x in zip(ident_cols, pref))
        r = reservoir._apply(excl, r_in[:, None])           # [B, F_loc]
        budgets = jnp.minimum(desired, mean_bits + r).reshape(b_loc * f_loc)
    else:
        budgets = jnp.full((b_loc * f_loc,), mean_bits, I32)

    # --- RD loop (local, batched)
    q, amp, gain, bits = rd.rd_batch(coeffs, allowed.astype(jnp.float32),
                                     budgets.astype(I32), bt, cfg.fs)
    cb, _ = entropy.payload_costs_and_choice(q, bt, cfg.fs)
    shp = (b_loc, f_loc)
    if pack_cap is not None:
        # build the record BYTES on device (ops/device_pack) so only
        # ~compressed-size data crosses back — the fused corpus path's
        # decision-array download (q alone is 2 kB/frame) dominated the
        # config-4 wall on the tunnelled PJRT
        from ..ops.device_pack import pack_records_device
        rec, nbytes = pack_records_device(q, amp, gain, bt, cb, cfg.fs,
                                          pack_cap)
        return (rec.reshape(shp + (pack_cap,)),
                nbytes.reshape(shp).astype(I32))
    return (q.reshape(shp + (-1,)).astype(jnp.int16),
            amp.reshape(shp + (-1,)).astype(jnp.int8),
            gain.reshape(shp).astype(jnp.int16),
            bt.reshape(shp).astype(jnp.int8),
            bits.reshape(shp),
            cb.reshape(shp + (-1,)).astype(jnp.int8))


def _shard_decode_body(q, e_band, bt, cfg, axis: str = "seq"):
    """Per-shard decode body (runs inside shard_map) — the decode-side
    long-context analog of _shard_encode_body (SURVEY.md §3.2, §5): each
    'seq' shard owns a contiguous run of frames, dequantizes and IMDCTs
    them locally, and the 50%-overlap-add needs exactly ONE ppermute — the
    previous shard's last synthesis frame's second half.

    q: [B_loc, F_loc, 1024] int16, e_band: [B_loc, F_loc, NB] int16,
    bt: [B_loc, F_loc] int8. Returns pcm hops [B_loc, F_loc * HOP] f32
    (global hop f = first_half[f] + second_half[f-1], the same single f32
    add the chunked decoder performs, so sharded == unsharded bitwise).
    """
    from ..ops.entropy import _select_by_bt

    naxis = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    lay = T.unified_layout(cfg.fs)
    b_loc, f_loc = bt.shape
    btf = bt.astype(I32).reshape(-1)
    qf = q.reshape(b_loc * f_loc, -1).astype(I32)
    ef = e_band.reshape(b_loc * f_loc, -1)
    bin_mask = _select_by_bt(lay["band_mask"], btf).astype(jnp.bfloat16)
    e_bin = jnp.einsum("fn,fin->fi", ef.astype(jnp.bfloat16), bin_mask,
                       precision=jax.lax.Precision.DEFAULT,
                       preferred_element_type=jnp.float32).astype(I32)
    xhat = quantize.dequantize(qf, e_bin)
    frames = dsp.synthesize(xhat, btf, cfg.window).reshape(
        b_loc, f_loc, C.LONG_SIZE)
    first = frames[:, :, :C.HOP]
    second = frames[:, :, C.HOP:]
    # N8 halo (decode direction): previous shard's last second-half
    right = [(i, (i + 1) % naxis) for i in range(naxis)]
    halo = jax.lax.ppermute(second[:, -1], axis, right)      # [B, HOP]
    halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
    prev_second = jnp.concatenate([halo[:, None], second[:, :-1]], axis=1)
    hops = first + prev_second                               # [B, F_loc, HOP]
    return hops.reshape(b_loc, f_loc * C.HOP)


def sharded_decode_step(mesh, cfg, total_frames: int):
    """Build the jitted sharded decode step for a ('data','seq') mesh.

    Input:  q [B, total_frames, 1024] i16, e_band [B, total_frames, NB]
            i16, bt [B, total_frames] i8 — per-channel frame records,
            tail-padded with zero frames so that (a) total_frames divides
            the 'seq' axis and (b) at least one pad frame exists (its hop
            then carries the final flush second-half, so the host just
            slices pcm[HOP : HOP + n_samples]).
    Output: pcm [B, total_frames * HOP] float32, sharded P('data','seq').
    """
    def body(q, e_band, bt):
        with jax.default_matmul_precision("highest"):
            return _shard_decode_body(q, e_band, bt, cfg=cfg)
    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "seq", None), P("data", "seq", None),
                  P("data", "seq")),
        out_specs=P("data", "seq"),
        check_vma=False)
    return jax.jit(sm)


def sharded_decode(data: bytes, mesh) -> tuple[np.ndarray, object]:
    """MRC1 bytes -> (pcm [n, channels] float32, cfg), decoded with the
    frame axis sharded over the mesh's 'seq' devices and channels over
    'data' — bitwise-equal to models.decoder.decode (tests/test_sharded.py).
    """
    import jax.numpy as jnp
    from ..spec import bitstream as spec_bitstream
    from ..models import decoder as mdec

    cfg, nf, n_samples, hdr_bits = spec_bitstream.read_header(data)
    nch = cfg.channels
    q, e_band, bt = mdec.parse_records(data)
    n_seq = mesh.shape["seq"]
    n_data = mesh.shape["data"]
    nf_pad = -(-(nf + 1) // n_seq) * n_seq      # >= nf+1 (flush hop)
    rows = -(-nch // n_data) * n_data           # silent rows pad 'data'
    lay = T.unified_layout(cfg.fs)
    qc = np.zeros((rows, nf_pad, C.LONG_COEFFS), np.int16)
    ec = np.zeros((rows, nf_pad, lay["nb"]), np.int16)
    bc = np.zeros((rows, nf_pad), np.int8)
    qc[:nch, :nf] = np.swapaxes(q.reshape(nf, nch, -1), 0, 1)
    ec[:nch, :nf] = np.swapaxes(e_band.reshape(nf, nch, -1), 0, 1)
    bc[:nch, :nf] = bt.reshape(nf, nch).T
    step = sharded_decode_step(mesh, cfg, nf_pad)
    from jax.sharding import NamedSharding
    sh3 = NamedSharding(mesh, P("data", "seq", None))
    sh2 = NamedSharding(mesh, P("data", "seq"))
    pcm = step(jax.device_put(jnp.asarray(qc), sh3),
               jax.device_put(jnp.asarray(ec), sh3),
               jax.device_put(jnp.asarray(bc), sh2))
    pcm = np.asarray(pcm)[:nch]
    return np.ascontiguousarray(pcm[:, C.HOP:C.HOP + n_samples].T), cfg


def sharded_encode_step(mesh, cfg, total_frames: int,
                        per_row_nf: bool = False,
                        pack_cap: int | None = None):
    """Build the jitted sharded encode step for a ('data','seq') mesh.

    Input:  xp [n_clips, total_frames * HOP] float32 — padded signals
            (without the leading priming hop), sharded P('data', 'seq').
            With per_row_nf=True the step takes a second argument
            nf_row [n_clips] int32 (each row's true frame count; rows are
            tail-padded with silence up to total_frames) so mixed-length
            clips share one executable with per-clip byte equality.
    Output: per-frame decision arrays, sharded P('data', 'seq') — or,
            with pack_cap set, the finished record bytes
            (rec [B, F, cap] u8, nbytes [B, F] i32) built on device.
    """
    def body(xp, nf_row):
        with jax.default_matmul_precision("highest"):
            return _shard_encode_body(xp, nf_row, cfg=cfg,
                                      total_frames=total_frames,
                                      pack_cap=pack_cap)
    if pack_cap is not None:
        out_specs = (P("data", "seq", None), P("data", "seq"))
    else:
        out_specs = (P("data", "seq", None), P("data", "seq", None),
                     P("data", "seq"), P("data", "seq"), P("data", "seq"),
                     P("data", "seq", None))
    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "seq"), P("data")),
        out_specs=out_specs,
        check_vma=False)
    jitted = jax.jit(sm)
    if per_row_nf:
        return jitted

    def uniform(xp):
        nf_row = jnp.full((xp.shape[0],), total_frames, I32)
        return jitted(xp, nf_row)

    return uniform
