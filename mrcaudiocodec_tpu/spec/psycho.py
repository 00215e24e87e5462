"""Normative psychoacoustic model (reference component R7, SURVEY.md §2).

FFT -> partition energies -> Schroeder spreading -> tonality (spectral
flatness) -> masking threshold (+ absolute threshold in quiet) -> per-band
allowed-noise and perceptual entropy.

Outputs live in the unified NB-band layout (`tables.unified_layout`), so
long and short frames flow through identical downstream shapes.

All signal arithmetic is float32 — the JAX path mirrors this file exactly
(mrcaudiocodec_tpu/ops/psycho.py).
"""
from __future__ import annotations

import functools

import numpy as np

from .. import config as C
from .. import tables as T

F32 = np.float32
TINY = F32(1e-20)
TMN_DB = 18.0      # tone-masking-noise offset
NMT_DB = 6.0       # noise-masking-tone offset
SIMPLE_OFFSET_DB = 12.0   # fixed offset when full_psycho=False
SMR_FLOOR = F32(1e-3)
SMR_CEIL = F32(1e12)


@functools.lru_cache(maxsize=None)
def _hann(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(F32)


@functools.lru_cache(maxsize=None)
def _psy_const(fs: int, n_bins: int, long_block: bool):
    """Float32-cast psycho tables + band mapping for one FFT size."""
    pt = T.psy_tables(fs, n_bins)
    edges = T.sfb_long(fs) if long_block else T.sfb_short(fs)
    nb = len(edges) - 1
    band_mat = T.band_matrix(edges, n_bins)
    pb = T.part_to_band_min_mat(fs, long_block)          # [NP, nb]
    counts = pt["part_mat"].sum(axis=0)
    # full-scale sine peak bin power for hann window of length 2*n_bins
    fs_sine_p = (n_bins * 0.5) ** 2
    return {
        "part_mat": pt["part_mat"].astype(F32),          # [bins, NP]
        "spread": pt["spread"].astype(F32),              # [NP, NP]
        "ath_part": (pt["ath_energy"] * fs_sine_p).astype(F32),   # [NP]
        "counts": counts.astype(F32),                    # [NP]
        "pb_mask": (pb > 0),                             # [NP, nb] bool
        "band_mat": band_mat.astype(F32),                # [bins, nb]
        "width": (edges[1:] - edges[:-1]).astype(F32),   # [nb]
        "nb": nb,
    }


SFM_FLOOR_REL = F32(1e-12)  # 120 dB dynamic-range floor for the power
                            # spectrum: bounds the cross-path sensitivity of
                            # log(p) on near-cancelled FFT leakage bins
                            # without adding audible-band pseudo-energy


def _block_thresholds(p: np.ndarray, cst, full_psycho: bool):
    """Power spectrum [bins] -> (band_threshold[nb], band_energy[nb]).

    band_threshold is total allowed noise energy per band in FFT units.
    """
    p = np.maximum(p, SFM_FLOOR_REL * p.max(axis=-1, keepdims=True))
    e_part = p @ cst["part_mat"]                                   # [NP]
    if full_psycho:
        spread_e = e_part @ cst["spread"]                          # [NP]
        # tonality via spectral flatness per partition
        log_gm = (np.log(p + TINY) @ cst["part_mat"]) / cst["counts"]
        geo = np.exp(log_gm.astype(F32))
        arith = e_part / cst["counts"] + TINY
        sfm_db = F32(10.0) * np.log10(np.minimum(geo / arith, F32(1.0)) + TINY)
        alpha = np.minimum(sfm_db / F32(-60.0), F32(1.0))
        offset_db = alpha * F32(TMN_DB) + (F32(1.0) - alpha) * F32(NMT_DB)
        t_part = spread_e * np.power(F32(10.0), -offset_db / F32(10.0))
    else:
        t_part = e_part * F32(10.0 ** (-SIMPLE_OFFSET_DB / 10.0))
    t_part = np.maximum(t_part, cst["ath_part"])
    # per-bin threshold density, conservative min over overlapping partitions
    t_density = t_part / cst["counts"]                             # [NP]
    big = F32(1e30)
    dens = np.where(cst["pb_mask"], t_density[:, None], big)       # [NP, nb]
    band_t = dens.min(axis=0) * cst["width"]                       # [nb]
    band_e = p @ cst["band_mat"]                                   # [nb]
    return band_t.astype(F32), band_e.astype(F32)


def analyze_frame(frame: np.ndarray, coeffs: np.ndarray, block_type: int,
                  fs: int, full_psycho: bool = True):
    """One frame -> (allowed[NB] float32, pe float32).

    allowed[b] = permitted quantization-noise energy in the MDCT domain:
    E_mdct[b] / SMR[b] with SMR measured in the FFT domain (the ratio
    transfers between domains and absorbs normalization differences).
    pe = perceptual entropy (bits-like difficulty measure for the bit
    reservoir allocator, SURVEY.md §2b N9).
    """
    lay = T.unified_layout(fs)
    nb = lay["nb"]
    edges = lay["edges"][block_type]
    frame = np.asarray(frame, dtype=F32)

    if block_type != C.SHORT:
        cst = _psy_const(fs, C.LONG_COEFFS, True)
        spec = np.fft.rfft(frame * _hann(C.LONG_SIZE))
        p = (spec.real.astype(F32) ** 2
             + spec.imag.astype(F32) ** 2)[:C.LONG_COEFFS]
        band_t, band_e = _block_thresholds(p, cst, full_psycho)
        nb_real = cst["nb"]
        t_full = np.full(nb, F32(1e30))
        e_full = np.zeros(nb, dtype=F32)
        t_full[:nb_real] = band_t
        e_full[:nb_real] = band_e
        width = cst["width"]
        pe = np.sum(width * np.log2(F32(1.0) + np.sqrt(band_e / (band_t + TINY))),
                    dtype=F32)
    else:
        cst = _psy_const(fs, C.SHORT_COEFFS, False)
        nbs = cst["nb"]
        t_full = np.full(nb, F32(1e30))
        e_full = np.zeros(nb, dtype=F32)
        pe = F32(0.0)
        off = C.SHORT_OFFSET
        for g in range(C.N_SHORT):
            sub = frame[off + g * C.SHORT_COEFFS:
                        off + g * C.SHORT_COEFFS + C.SHORT_SIZE]
            spec = np.fft.rfft(sub * _hann(C.SHORT_SIZE))
            p = (spec.real.astype(F32) ** 2
                 + spec.imag.astype(F32) ** 2)[:C.SHORT_COEFFS]
            band_t, band_e = _block_thresholds(p, cst, full_psycho)
            t_full[g * nbs:(g + 1) * nbs] = band_t
            e_full[g * nbs:(g + 1) * nbs] = band_e
            pe = pe + np.sum(
                cst["width"] * np.log2(F32(1.0)
                                       + np.sqrt(band_e / (band_t + TINY))),
                dtype=F32)

    # SMR in FFT units, then allowed noise in MDCT units per band.
    smr = np.clip(e_full / (t_full + TINY), SMR_FLOOR, SMR_CEIL)
    x2 = np.asarray(coeffs, dtype=F32) ** 2
    e_mdct = np.add.reduceat(
        np.concatenate([x2, [F32(0.0)]]), edges[:-1])
    e_mdct = np.where(edges[1:] > edges[:-1], e_mdct, F32(0.0)).astype(F32)
    allowed = (e_mdct / smr).astype(F32)
    return allowed, F32(pe), e_mdct
