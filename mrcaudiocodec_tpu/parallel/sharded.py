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


def _shard_encode_body(xp, cfg, total_frames: int, axis: str = "seq"):
    """Per-shard encode body (runs inside shard_map).

    xp: [B_loc, F_loc * HOP] — this shard's contiguous chunk of the padded
    signal (global layout: [zeros(HOP) | x | zeros] with the leading
    priming hop NOT included; it materializes as shard 0's zero halo).
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
        hi_l, lo_l = reservoir.split_pe_sums(pe_q, axis=1)  # [B] each
        hi_g = jax.lax.psum(hi_l, axis)
        lo_g = jax.lax.psum(lo_l, axis)
        mean_pe = reservoir.mean_pe_from_sums(hi_g, lo_g,
                                              total_frames)  # [B]
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
    return (q.reshape(shp + (-1,)).astype(jnp.int16),
            amp.reshape(shp + (-1,)).astype(jnp.int8),
            gain.reshape(shp).astype(jnp.int16),
            bt.reshape(shp).astype(jnp.int8),
            bits.reshape(shp),
            cb.reshape(shp + (-1,)).astype(jnp.int8))


def sharded_encode_step(mesh, cfg, total_frames: int):
    """Build the jitted sharded encode step for a ('data','seq') mesh.

    Input:  xp [n_clips, total_frames * HOP] float32 — padded signals
            (without the leading priming hop), sharded P('data', 'seq').
    Output: per-frame decision arrays, sharded P('data', 'seq').
    """
    def body(xp):
        with jax.default_matmul_precision("highest"):
            return _shard_encode_body(xp, cfg=cfg, total_frames=total_frames)
    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=P("data", "seq"),
        out_specs=(P("data", "seq", None), P("data", "seq", None),
                   P("data", "seq"), P("data", "seq"), P("data", "seq"),
                   P("data", "seq", None)),
        check_vma=False)
    return jax.jit(sm)
