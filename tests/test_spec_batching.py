"""The spec codec's batched stage forms (rev 5: dsp.analyze_frames,
psycho.analyze_frames, rd.rd_frames) must be VALUE-IDENTICAL to the
per-frame reference definitions — batching is a speed rewrite of the
normative NumPy path, not a semantic change (VERDICT r4 next-step 8:
keep the >=100x target's denominator honest without moving it).
"""
import numpy as np

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu.config import CodecConfig
from mrcaudiocodec_tpu.spec import dsp, psycho, rd, reservoir


def _frames_with_types(seconds=0.8, fs=44100, seed=0):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.15 * np.sin(2 * np.pi * 3000 * t)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
    for pos in range(fs // 4, n - 200, fs // 3):
        x[pos:pos + 64] += (0.7 * rng.standard_normal(64)).astype(np.float32)
    x = np.clip(x, -1, 1)
    frames = dsp.frame_signal(x)
    bt = dsp.block_types(dsp.detect_transients(frames), True)
    return frames, bt


def test_batched_stages_equal_per_frame():
    fs = 44100
    cfg = CodecConfig(fs=fs, channels=1, bitrate=96000)
    frames, bt = _frames_with_types(fs=fs)
    assert (bt == C.SHORT).any() and (bt != C.SHORT).any(), \
        "clip must exercise both block families"

    coeffs_b = dsp.analyze_frames(frames, bt, cfg.window)
    allowed_b, pe_b, em_b = psycho.analyze_frames(frames, coeffs_b, bt, fs,
                                                  cfg.full_psycho)
    for f in range(len(frames)):
        c1 = dsp.analyze_frame(frames[f], int(bt[f]), cfg.window)
        np.testing.assert_array_equal(coeffs_b[f], c1, f"coeffs frame {f}")
        a1, p1, e1 = psycho.analyze_frame(frames[f], c1, int(bt[f]), fs,
                                          cfg.full_psycho)
        np.testing.assert_array_equal(allowed_b[f], a1, f"allowed frame {f}")
        np.testing.assert_array_equal(em_b[f], e1, f"e_mdct frame {f}")
        assert pe_b[f] == p1, f"pe frame {f}"

    budgets = reservoir.allocate(pe_b, cfg)
    q_b, amp_b, gain_b, bits_b = rd.rd_frames(coeffs_b, allowed_b, budgets,
                                              bt, fs)
    for f in range(len(frames)):
        q1, amp1, gain1, bits1 = rd.rd_frame(
            coeffs_b[f], allowed_b[f], int(budgets[f]), int(bt[f]), fs)
        np.testing.assert_array_equal(q_b[f], q1, f"q frame {f}")
        np.testing.assert_array_equal(amp_b[f], amp1, f"amp frame {f}")
        assert gain_b[f] == gain1, f"gain frame {f}"
        assert bits_b[f] == bits1, f"bits frame {f}"


def test_batched_rd_adversarial_budgets():
    """Decision identity must hold in the fallback corners: starved
    budgets (no candidate fits -> GAIN_MAX fallback), lavish budgets
    (gain 0 fits immediately), zero/huge allowed-noise (outer loop exits
    first iteration vs amplifies to AMP_MAX), and silent frames."""
    fs = 44100
    rng = np.random.default_rng(7)
    nf = 24
    from mrcaudiocodec_tpu import tables as T
    nb = T.unified_layout(fs)["nb"]
    coeffs = (rng.standard_normal((nf, C.LONG_COEFFS)).astype(np.float32)
              * np.float32(40.0))
    coeffs[0] = 0.0                                  # silent frame
    coeffs[1] = np.float32(3000.0)                   # loud flat frame
    bt = rng.integers(0, 5, nf).astype(np.int32)
    allowed = np.abs(rng.standard_normal((nf, nb))).astype(np.float32)
    allowed[2] = 0.0                                 # force amplification
    allowed[3] = np.float32(1e30)                    # converge instantly
    budgets = rng.integers(60, 6000, nf).astype(np.int64)
    budgets[4] = 40                                  # starved: below fixed
    budgets[5] = 10 ** 6                             # lavish
    q_b, amp_b, gain_b, bits_b = rd.rd_frames(coeffs, allowed, budgets,
                                              bt, fs)
    for f in range(nf):
        q1, amp1, gain1, bits1 = rd.rd_frame(
            coeffs[f], allowed[f], int(budgets[f]), int(bt[f]), fs)
        np.testing.assert_array_equal(q_b[f], q1, f"q frame {f}")
        np.testing.assert_array_equal(amp_b[f], amp1, f"amp frame {f}")
        assert gain_b[f] == gain1 and bits_b[f] == bits1, f"frame {f}"


def test_batched_rd_tiny_slab_boundary():
    """Slab compaction must be exact across slab boundaries: force
    multiple slabs by monkeypatching SLAB small."""
    fs = 44100
    cfg = CodecConfig(fs=fs, channels=1, bitrate=96000)
    frames, bt = _frames_with_types(seconds=0.4, fs=fs, seed=3)
    coeffs = dsp.analyze_frames(frames, bt, cfg.window)
    allowed, pe, _ = psycho.analyze_frames(frames, coeffs, bt, fs, True)
    budgets = reservoir.allocate(pe, cfg)
    big = rd.rd_frames(coeffs, allowed, budgets, bt, fs)
    old = rd.SLAB
    try:
        rd.SLAB = 3
        small = rd.rd_frames(coeffs, allowed, budgets, bt, fs)
    finally:
        rd.SLAB = old
    for a, b in zip(big, small):
        np.testing.assert_array_equal(a, b)
