"""MDCT/IMDCT unit tests: direct-definition parity + perfect reconstruction
(SURVEY.md §4: 'MDCT/IMDCT perfect reconstruction ... TDAC identity')."""
import numpy as np
import pytest

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu.spec import dsp


def direct_mdct(v):
    """O(N^2) textbook MDCT, float64, orthonormal scaling."""
    m = len(v) // 2
    n = np.arange(2 * m)
    k = np.arange(m)[:, None]
    return (np.cos(np.pi / m * (n[None, :] + 0.5 + m / 2) * (k + 0.5)) @ v
            ) * np.sqrt(2.0 / m)


@pytest.mark.parametrize("m", [128, 1024])
def test_mdct_matches_direct_definition(m):
    rng = np.random.default_rng(0)
    v = rng.standard_normal(2 * m)
    np.testing.assert_allclose(dsp.mdct(v.astype(np.float32)),
                               direct_mdct(v), atol=2e-5)


def test_fold_unfold_adjoint():
    rng = np.random.default_rng(1)
    v = rng.standard_normal(2048).astype(np.float64)
    u = rng.standard_normal(1024).astype(np.float64)
    # <fold(v), u> == <v, unfold(u)>
    a = float(dsp._fold(v) @ u)
    b = float(v @ dsp._unfold(u))
    assert abs(a - b) < 1e-9


def _roundtrip(x, block_type_seq):
    frames = dsp.frame_signal(x)
    outs = np.stack([
        dsp.synthesize_frame(dsp.analyze_frame(frames[f], int(bt)), int(bt))
        for f, bt in enumerate(block_type_seq)
    ])
    return dsp.overlap_add(outs, len(x))


def test_perfect_reconstruction_long_only():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(20000).astype(np.float32) * 0.5
    nf = dsp.frame_signal(x).shape[0]
    y = _roundtrip(x, np.zeros(nf, np.int32))
    assert np.abs(y - x).max() < 2e-6


def test_perfect_reconstruction_window_switching():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(30000).astype(np.float32) * 0.5
    nf = dsp.frame_signal(x).shape[0]
    # hand-built legal sequence exercising every block type
    tr = np.zeros(nf, bool)
    tr[[4, 5, 8, 12]] = True     # two adjacent shorts, isolated shorts
    bt = dsp.block_types(tr, True)
    assert set(bt.tolist()) >= {C.LONG, C.START, C.SHORT, C.STOP}
    y = _roundtrip(x, bt)
    assert np.abs(y - x).max() < 2e-6


def test_perfect_reconstruction_startstop():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(30000).astype(np.float32) * 0.5
    nf = dsp.frame_signal(x).shape[0]
    tr = np.zeros(nf, bool)
    tr[[6, 8]] = True            # gap of one => STARTSTOP at frame 7
    bt = dsp.block_types(tr, True)
    assert C.STARTSTOP in bt.tolist()
    y = _roundtrip(x, bt)
    assert np.abs(y - x).max() < 2e-6


def test_block_type_transitions_legal():
    """Property: adjacent window halves always complementary
    (SURVEY.md §4 'window-switch FSM never emits illegal transitions')."""
    rng = np.random.default_rng(5)
    for _ in range(50):
        tr = rng.random(30) < 0.3
        bt = dsp.block_types(tr, True)
        short_edge_right = np.isin(bt, [C.START, C.SHORT, C.STARTSTOP])
        short_edge_left = np.isin(bt, [C.STOP, C.SHORT, C.STARTSTOP])
        # frame f's right edge type must equal frame f+1's left edge type
        np.testing.assert_array_equal(short_edge_right[:-1],
                                      short_edge_left[1:])


def test_transient_detector_fires_on_attack():
    x = np.zeros(8192, np.float32)
    x[5000:5100] = 0.9
    frames = dsp.frame_signal(x)
    assert dsp.detect_transients(frames).any()
    # steady tone does not fire (ignoring the signal-onset frames, where an
    # attack flag is correct behavior)
    t = np.arange(8192) / 44100
    x2 = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    assert not dsp.detect_transients(dsp.frame_signal(x2))[2:].any()


# ---------------------------------------------------------------------------
# xmath cross-backend bit-exactness (the determinism core)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("m", [128, 1024])
def test_dct_iv_numpy_vs_engine_bitwise(m):
    """ops.dsp.dct_iv_dev is BIT-identical to the NumPy xmath sequence —
    the property the spec<->engine byte-equality contract now rests on.
    On CPU this exercises the pure_callback route (XLA:CPU contracts
    mul+add to FMA and cannot run the sequence faithfully); on TPU it
    exercises the jnp xmath path (measured contraction-free)."""
    import jax
    import jax.numpy as jnp

    from mrcaudiocodec_tpu import xmath
    from mrcaudiocodec_tpu.ops import dsp as jdsp

    rng = np.random.default_rng(3)
    for shape in [(9, m), (4, 8, m)] if m == 128 else [(9, m)]:
        u = (0.6 * rng.standard_normal(shape)).astype(np.float32)
        a = xmath.dct_iv(u, np)
        b = np.asarray(jax.jit(jdsp.dct_iv_dev)(jnp.asarray(u)))
        assert (a.view(np.uint32) == b.view(np.uint32)).all()


@pytest.mark.parametrize("m", [128, 1024])
def test_dct_iv_matches_matrix(m):
    """xmath.dct_iv equals the orthonormal DCT-IV matrix to f32 accuracy."""
    from mrcaudiocodec_tpu import tables as T
    from mrcaudiocodec_tpu import xmath

    rng = np.random.default_rng(4)
    u = (0.6 * rng.standard_normal((5, m))).astype(np.float32)
    ref = (u.astype(np.float64) @ T.dct_iv_matrix(m).T)
    got = xmath.dct_iv(u, np)
    np.testing.assert_allclose(got, ref, atol=3e-6 * np.abs(ref).max())


@pytest.mark.parametrize("m", [128, 1024])
def test_dct_iv_fast_bitwise_equals_reference(m):
    """The roll-form evaluation (classic-DIF storage + transpose bitrev,
    xmath.dct_iv_fast — the TPU engine's production path) computes values
    BIT-identical to the normative Stockham sequence: same butterflies on
    the same operands, different storage schedule."""
    from mrcaudiocodec_tpu import xmath

    rng = np.random.default_rng(7)
    for scale in (1.0, 1e-6, 1e4):
        u = (scale * rng.standard_normal((23, m))).astype(np.float32)
        a = xmath.dct_iv(u, np)
        b = xmath.dct_iv_fast(u, np)
        assert (a.view(np.uint32) == b.view(np.uint32)).all()
    # signed zeros and 3-D leading dims
    u = np.zeros((3, 4, m), np.float32)
    u[1] = -0.0
    assert (xmath.dct_iv(u, np).view(np.uint32)
            == xmath.dct_iv_fast(u, np).view(np.uint32)).all()
    fr = rng.standard_normal((11, 2 * m)).astype(np.float32)
    w = rng.standard_normal((2 * m,)).astype(np.float32)
    assert (xmath.mdct_windowed(fr, w, np).view(np.uint32)
            == xmath.mdct_windowed_fast(fr, w, np).view(np.uint32)).all()
    x = rng.standard_normal((11, m)).astype(np.float32)
    assert (xmath.imdct_windowed(x, w, np).view(np.uint32)
            == xmath.imdct_windowed_fast(x, w, np).view(np.uint32)).all()


def test_analyze_spec_vs_engine_bitwise():
    """Whole-filterbank bit equality: spec.analyze_frame vs ops.dsp.analyze
    coefficients match BITWISE for every block type (fold, window multiply
    and DCT-IV all pinned single-IEEE-op sequences)."""
    import jax.numpy as jnp

    from mrcaudiocodec_tpu.ops import dsp as jdsp

    rng = np.random.default_rng(5)
    frames = (0.5 * rng.standard_normal((130, C.LONG_SIZE))).astype(np.float32)
    bt = np.resize(np.arange(5, dtype=np.int32), 130)
    ref = np.stack([dsp.analyze_frame(frames[f], int(bt[f]))
                    for f in range(len(bt))])
    got = np.asarray(jdsp.analyze(jnp.asarray(frames), jnp.asarray(bt)))
    assert (ref.view(np.uint32) == got.view(np.uint32)).all()
