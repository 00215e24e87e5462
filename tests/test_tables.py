"""Unit tests for shared tables (SURVEY.md §4 'unit (pure math)')."""
import numpy as np
import pytest

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu import tables as T


@pytest.mark.parametrize("fs", [32000, 44100, 48000])
def test_sfb_edges(fs):
    for edges, n in [(T.sfb_long(fs), C.LONG_COEFFS),
                     (T.sfb_short(fs), C.SHORT_COEFFS)]:
        assert edges[0] == 0 and edges[-1] == n
        assert np.all(np.diff(edges) >= 4)
        assert np.all(edges % 4 == 0)          # tuple-aligned for codebooks
        assert np.all(np.diff(edges) > 0)


def test_windows_princen_bradley():
    for kind in ("sine", "kbd"):
        lr, lf, sr, sf = T.window_halves(kind)
        np.testing.assert_allclose(lr ** 2 + lf ** 2, 1.0, atol=1e-12)
        np.testing.assert_allclose(sr ** 2 + sf ** 2, 1.0, atol=1e-12)


def test_composed_window_boundaries():
    w = T.long_windows("sine")
    # START right edge must be complementary to a SHORT first sub-window:
    # ones region then short fall then zeros
    start_right = w[C.START][C.LONG_COEFFS:]
    assert np.all(start_right[:C.SHORT_OFFSET] == 1.0)
    assert np.all(start_right[-C.SHORT_OFFSET:] == 0.0)


@pytest.mark.parametrize("which", ["small", "mid", "esc", "sf"])
def test_codebooks_kraft_and_decode(which):
    if which == "sf":
        cb = T.sf_codebook()
    else:
        cb = T.spectrum_codebooks()["small mid esc".split().index(which)]
    lengths = cb.lengths
    assert lengths.max() <= C.MAX_CODE_LEN
    kraft = np.sum(2.0 ** (-lengths.astype(np.float64)))
    assert kraft <= 1.0 + 1e-12
    # canonical decode tables invert every codeword
    min_len, max_len, first_code, first_sym, order = T.decode_table(which)
    counts = np.bincount(lengths, minlength=max_len + 2)
    for sym in range(len(cb.codes)):
        code, ln = int(cb.codes[sym]), int(lengths[sym])
        idx = code - first_code[ln]
        assert 0 <= idx < counts[ln]
        assert order[first_sym[ln] + idx] == sym


def test_codebook_tuple_roundtrip():
    cb1, cb2, cb3 = T.spectrum_codebooks()
    for cb in (cb1, cb2, cb3):
        n = len(cb.codes)
        idx = np.arange(n)
        tup = cb.sym_tuple(idx)
        np.testing.assert_array_equal(cb.sym_index(tup), idx)


def test_unified_layout():
    for fs in (44100, 48000):
        lay = T.unified_layout(fs)
        nb = lay["nb"]
        assert lay["edges"].shape == (C.N_BLOCK_TYPES, nb + 1)
        for bt in range(C.N_BLOCK_TYPES):
            e = lay["edges"][bt]
            assert e[0] == 0 and e[-1] == C.LONG_COEFFS
            assert np.all(np.diff(e) >= 0)
            # bin_band consistent with edges
            bb = lay["bin_band"][bt]
            for b in range(nb):
                if e[b + 1] > e[b]:
                    assert np.all(bb[e[b]:e[b + 1]] == b)


def test_psy_tables():
    pt = T.psy_tables(44100, C.LONG_COEFFS)
    np.testing.assert_allclose(pt["spread"].sum(axis=1), 1.0, atol=1e-9)
    assert np.all(pt["ath_energy"] > 0)
    assert pt["npart"] > 40


def test_escape_len():
    np.testing.assert_array_equal(
        T.escape_len(np.array([0, 15, 16, 31, 32, 4095])),
        [0, 0, 5, 5, 7, 19])
