"""JAX bit-reservoir allocator (mirror of spec/reservoir.py, R11/N9).

The reservoir state transition r' = clip(r + a, lo, hi) is a clamped-add
map; such maps form a monoid under composition

    (a1,l1,h1) then (a2,l2,h2) = (a1+a2,
                                  min(h2, max(l2, l1+a2)),
                                  min(h2, max(l2, h1+a2)))

so the whole per-frame chain evaluates with `lax.associative_scan` — O(log F)
depth on device, and shardable across devices by composing per-shard maps
with one small collective (SURVEY.md §2b N9, §5 'long-context').

All arithmetic is int32. The one long-horizon sum (mean PE over the whole
clip) uses an exact 8/8 split so it cannot overflow before ~4M frames
(~26 h of 44.1 kHz audio) even at the maximum quantized PE; the remaining
bound is the reservoir scan's accumulated drift |sum(mean_bits - desired)|
< 2^31 — about 8 days of audio at 128 kbps. Both far beyond any clip the
format's 32-bit sample-count header can express (~13.5 h).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as C

I32 = jnp.int32


def _compose(f, g):
    """Compose clamped-add maps: apply f first, then g. Elementwise/batched."""
    a1, l1, h1 = f
    a2, l2, h2 = g
    return (a1 + a2,
            jnp.minimum(h2, jnp.maximum(l2, l1 + a2)),
            jnp.minimum(h2, jnp.maximum(l2, h1 + a2)))


def _apply(m, x):
    a, l, h = m
    return jnp.minimum(h, jnp.maximum(l, x + a))


def desired_bits(pe_q: jnp.ndarray, mean_bits: int, mean_pe) -> jnp.ndarray:
    """Integer-exact mirror of spec.reservoir.desired_bits."""
    lo = int(mean_bits * C.MIN_FRAME_FRAC)
    hi = int(mean_bits * (1.0 + C.RESERVOIR_MAX_WITHDRAW))
    mean_pe = jnp.maximum(jnp.asarray(mean_pe, I32), 1)
    return jnp.clip((mean_bits * pe_q.astype(I32)) // mean_pe, lo, hi)


def quantize_pe(pe: jnp.ndarray) -> jnp.ndarray:
    pe = jnp.clip(pe.astype(jnp.float32), 0.0, 65535.0)
    return jnp.floor(pe).astype(I32)


def split_pe_sums(pe_q: jnp.ndarray, axis=-1):
    """Overflow-safe pieces of sum(pe_q): (hi, lo) with the true sum equal
    to 256*hi + lo. pe_q < 2^16, so hi/lo stay below 256*F — int32-safe to
    ~4M frames (vs ~32k frames for a direct worst-case int32 sum)."""
    return ((pe_q >> 8).sum(axis=axis), (pe_q & 0xFF).sum(axis=axis))


def mean_pe_from_sums(hi, lo, nf):
    """Exact max(1, (256*hi + lo) // nf) in int32: the nf-divisible part of
    256*hi splits off first, so no intermediate exceeds ~512*nf."""
    nf = jnp.asarray(nf, I32)
    mean = (hi // nf) * 256 + ((hi % nf) * 256 + lo) // nf
    return jnp.maximum(mean, 1)


def mean_pe_exact(pe_q: jnp.ndarray, nf) -> jnp.ndarray:
    """Integer-exact mirror of spec.reservoir.mean_pe_of (host int64) that
    stays in int32 on device: floor(sum(pe_q)/nf), min 1."""
    hi, lo = split_pe_sums(pe_q)
    return mean_pe_from_sums(hi, lo, nf)


def budgets_scan(desired: jnp.ndarray, mean_bits: int, cap: int,
                 r0=0) -> jnp.ndarray:
    """[F] desired -> [F] budgets via associative clamped-add scan.

    budget[f] = min(desired[f], mean + r[f]) with
    r[f+1] = clip(r[f] + mean - desired[f], 0, cap), r[0] = r0.
    """
    a = (mean_bits - desired).astype(I32)
    lo = jnp.zeros_like(a)
    hi = jnp.full_like(a, cap)
    pref = jax.lax.associative_scan(_compose, (a, lo, hi))   # inclusive
    r0v = jnp.asarray(r0, I32)
    r_incl = _apply(pref, r0v)                               # r[f+1]
    r = jnp.concatenate([r0v[None], r_incl[:-1]])            # r[f]
    return jnp.minimum(desired.astype(I32), mean_bits + r), r_incl[-1]


def allocate(pe: jnp.ndarray, cfg, mean_pe) -> jnp.ndarray:
    """[F] float32 PE -> [F] int32 budgets (device-side, exact)."""
    mean_bits = int(cfg.mean_frame_bits)
    if not cfg.reservoir:
        return jnp.full(pe.shape, mean_bits, I32)
    desired = desired_bits(quantize_pe(pe), mean_bits, mean_pe)
    budgets, _ = budgets_scan(desired, mean_bits, cfg.reservoir_cap)
    return budgets
