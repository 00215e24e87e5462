"""Spec codec integration tests: encode/decode roundtrip, rate discipline,
reservoir properties (SURVEY.md §4 'golden/conformance' + 'property tests').
"""
import numpy as np
import pytest

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu.config import CodecConfig
from mrcaudiocodec_tpu.spec import bitstream, codec, dsp, psycho, reservoir


def make_clip(fs, seconds, stereo=False, transient=True, seed=0):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    x = (0.45 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 2350 * t)
         + 0.08 * np.sin(2 * np.pi * 9000 * t)).astype(np.float32)
    x += 0.01 * rng.standard_normal(n).astype(np.float32)
    if transient:
        for pos in range(fs // 2, n - 200, fs):
            x[pos:pos + 64] += (0.6 * rng.standard_normal(64)).astype(np.float32)
    x = np.clip(x, -1, 1)
    if stereo:
        x2 = np.roll(x, 7) * 0.9
        return np.stack([x, x2], axis=1)
    return x[:, None]


def snr_db(x, y):
    err = x - y
    return 10 * np.log10((np.mean(x ** 2) + 1e-30) / (np.mean(err ** 2) + 1e-30))


@pytest.mark.parametrize("fs,channels,bitrate", [
    (44100, 1, 96000),        # acceptance config 1 (BASELINE.json:7)
    (44100, 2, 128000),       # acceptance config 2 (BASELINE.json:8)
    (48000, 2, 192000),       # acceptance config 3 (BASELINE.json:9)
])
def test_roundtrip_snr(fs, channels, bitrate):
    cfg = CodecConfig(fs=fs, channels=channels, bitrate=bitrate)
    x = make_clip(fs, 1.0, stereo=(channels == 2))
    bs = codec.encode(x, cfg)
    y, cfg2 = codec.decode(bs)
    assert cfg2.fs == fs and cfg2.channels == channels
    assert y.shape == x.shape
    s = snr_db(x, y)
    assert s > 25.0, f"SNR too low: {s:.1f} dB"
    # produced rate does not exceed target (+header slop)
    dur = x.shape[0] / fs
    assert len(bs) * 8 <= bitrate * dur * 1.02 + 512


def test_long_windows_only_mode():
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000,
                      window_switching=False)
    x = make_clip(44100, 0.5)
    bs = codec.encode(x, cfg)
    y, _ = codec.decode(bs)
    assert snr_db(x, y) > 25.0


def test_psycho_disabled_mode():
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000, full_psycho=False)
    x = make_clip(44100, 0.5)
    bs = codec.encode(x, cfg)
    y, _ = codec.decode(bs)
    assert snr_db(x, y) > 25.0


def test_reservoir_disabled_mode():
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000, reservoir=False)
    x = make_clip(44100, 0.5)
    bs = codec.encode(x, cfg)
    y, _ = codec.decode(bs)
    assert snr_db(x, y) > 25.0


def test_frame_bits_within_budget():
    """Property: every frame's record obeys its allocated budget
    (SURVEY.md §4 'rate loop never exceeds budget')."""
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    x = make_clip(44100, 1.0)
    records, bt, budgets = codec.encode_channel(x[:, 0], cfg)
    for f, (codes, lens) in enumerate(records):
        content = sum(lens)
        total = C.FRAME_LEN_BITS + content + (-(C.FRAME_LEN_BITS + content)) % 8
        assert total <= budgets[f], f"frame {f}: {total} > {budgets[f]}"


def test_reservoir_bounds():
    """Property: reservoir never negative nor above cap."""
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    rng = np.random.default_rng(0)
    pe = rng.uniform(0, 3000, 500).astype(np.float32)
    budgets = reservoir.allocate(pe, cfg)
    mean_bits = int(np.floor(cfg.mean_frame_bits))
    r = 0
    for f in range(len(pe)):
        assert budgets[f] >= int(C.MIN_FRAME_FRAC * mean_bits) - 1
        assert budgets[f] <= mean_bits + r
        r = min(max(r + mean_bits - int(budgets[f]), 0), cfg.reservoir_cap)
        assert 0 <= r <= cfg.reservoir_cap


def test_header_roundtrip():
    from mrcaudiocodec_tpu.utils.bits import BitWriter
    cfg = CodecConfig(fs=48000, channels=2, bitrate=192000,
                      window_switching=False, full_psycho=False,
                      reservoir=False, window="kbd")
    w = BitWriter()
    bitstream.write_header(w, cfg, 1234, 567890)
    cfg2, nf, ns, pos = bitstream.read_header(w.getvalue())
    assert cfg2 == cfg and nf == 1234 and ns == 567890
    assert pos == bitstream.HEADER_BYTES * 8


def test_frame_byte_offsets_scan():
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    x = make_clip(44100, 0.3)
    bs = codec.encode(x, cfg)
    cfg2, nf, ns, hdr_bits = bitstream.read_header(bs)
    offs, lens = bitstream.frame_byte_offsets(bs, hdr_bits // 8, nf)
    assert offs[0] == bitstream.HEADER_BYTES
    # offsets must be strictly increasing and end within the buffer
    assert np.all(np.diff(offs) > 0)
    last = offs[-1] + (C.FRAME_LEN_BITS + lens[-1] + 7) // 8
    assert last == len(bs)


def test_32khz_support():
    cfg = CodecConfig(fs=32000, channels=1, bitrate=64000)
    x = make_clip(32000, 0.5)
    bs = codec.encode(x, cfg)
    y, cfg2 = codec.decode(bs)
    assert cfg2.fs == 32000
    assert snr_db(x, y) > 20.0


def test_header_and_prefix_hardening():
    """Corrupt headers and truncated record scans raise ValueError — never
    IndexError (VERDICT r4 weak #4): the Python parser must guard like the
    native one (mrc_native.cpp fs_code/bounds checks)."""
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    bs = codec.encode(make_clip(44100, 0.3), cfg)

    # fs_code >= 3 (byte 5 high nibble) -> ValueError, not IndexError
    buf = bytearray(bs)
    buf[5] = (0xF << 4) | (buf[5] & 0x0F)
    with pytest.raises(ValueError):
        bitstream.read_header(bytes(buf))

    # header shorter than HEADER_BYTES
    with pytest.raises(ValueError):
        bitstream.read_header(bs[:10])

    # header with inconsistent sample/frame counts
    buf = bytearray(bs)
    buf[10:14] = (0).to_bytes(4, "big")           # n_frames = 0
    with pytest.raises(ValueError):
        bitstream.read_header(bytes(buf))

    # record prefix scan walking off a truncated buffer
    _, nf, _, hb = bitstream.read_header(bs)
    with pytest.raises(ValueError):
        bitstream.frame_byte_offsets(bs[:len(bs) - 2], hb // 8, nf)

    # absurd record count rejected in O(1), not scanned for minutes
    with pytest.raises(ValueError):
        bitstream.frame_byte_offsets(bs, hb // 8, 2 ** 31)


def test_cli_decode_invalid_input_message(tmp_path, capsys):
    """`cli decode` on a truncated file prints 'invalid input' and returns
    nonzero — never a traceback (VERDICT r4 weak #4)."""
    from mrcaudiocodec_tpu import cli

    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    bs = codec.encode(make_clip(44100, 0.3), cfg)
    bad = tmp_path / "trunc.mrc"
    bad.write_bytes(bs[:len(bs) // 2])
    out = tmp_path / "out.wav"
    rc = cli.main(["decode", str(bad), str(out), "--engine", "spec"])
    assert rc == 1
    assert "invalid input" in capsys.readouterr().err


def test_spec_decode_corrupt_stream_safe():
    """Spec decoder must reject corrupt/truncated payloads with ValueError —
    never crash, hang, or overrun (mirror of the native decoder fuzz,
    tests/test_native.py)."""
    rng = np.random.default_rng(11)
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    x = make_clip(44100, 0.3)
    bs = codec.encode(x, cfg)
    for trial in range(16):
        buf = bytearray(bs)
        for _ in range(30):
            pos = int(rng.integers(bitstream.HEADER_BYTES, len(buf)))
            buf[pos] ^= int(rng.integers(1, 256))
        cut = bytes(buf[:int(rng.integers(bitstream.HEADER_BYTES + 4,
                                          len(buf) + 1))])
        try:
            codec.decode(cut)
        except ValueError:
            pass              # clean rejection is the expected outcome


def test_spec_decode_oversized_escape_rejected():
    """A crafted CB_ESC payload whose escape unary prefix runs past the
    QMAX-legal exponent (e=11) must raise ValueError — not wrap a huge
    int64 value into the int32 q array (spec/entropy.py escape guard)."""
    from mrcaudiocodec_tpu import tables as T
    from mrcaudiocodec_tpu.spec.entropy import _Bits, decode_frame_content
    from mrcaudiocodec_tpu.utils.bits import BitWriter, unpack_to_bits

    fs = 44100
    lay = T.unified_layout(fs)
    ca = T.code_arrays()
    bt = 0                                   # LONG
    width = lay["width"][bt]
    real = np.where(width > 0)[0]

    w = BitWriter()
    w.write(bt, C.BLOCK_TYPE_BITS)
    w.write(100, C.GAIN_BITS)
    for b in real:                           # band 0 CB_ESC, rest CB_ZERO
        w.write(C.CB_ESC if b == real[0] else C.CB_ZERO, C.CB_BITS)
    sf0 = int(ca["codes_sf"][C.SF_DELTA_MAX])     # delta = 0
    sf0_len = int(ca["len_sf"][C.SF_DELTA_MAX])
    for _ in real:
        w.write(sf0, sf0_len)
    # first pair of band 0: magnitudes (16, 0) -> escape on value 0
    sym = 16 * (C.ESC_MAG + 1) + 0
    w.write(int(ca["codes_esc"][sym]), int(ca["len_esc"][sym]))
    w.write(0, 1)                            # sign bit (positive)
    w.write((1 << 14) - 1, 14)               # unary run: e would reach 18
    w.write(0, 50)                           # padding so reads never EOF
    bits = unpack_to_bits(w.getvalue())
    with pytest.raises(ValueError, match="escape exponent"):
        decode_frame_content(_Bits(bits), fs)


def test_spec_decode_max_escape_roundtrips():
    """QMAX itself (e=11, all-ones suffix) must still decode: the guard
    rejects only exponents beyond the encodable range."""
    fs = 44100
    from mrcaudiocodec_tpu import tables as T
    from mrcaudiocodec_tpu.spec.entropy import (_Bits, decode_frame_content,
                                                encode_frame_symbols)
    from mrcaudiocodec_tpu.utils.bits import pack_codes, unpack_to_bits
    q = np.zeros(C.LONG_COEFFS, dtype=np.int32)
    q[0] = C.QMAX
    q[1] = -C.QMAX
    amp = np.zeros(T.unified_layout(fs)["nb"], dtype=np.int32)
    codes, lens = encode_frame_symbols(q, amp, 120, 0, fs)
    bits = unpack_to_bits(pack_codes(np.asarray(codes, np.uint64),
                                     np.asarray(lens, np.int64)))
    q2, _, bt2, gain2 = decode_frame_content(_Bits(bits), fs)
    assert bt2 == 0 and gain2 == 120
    np.testing.assert_array_equal(q2, q)


def test_spec_decode_random_bytes_safe():
    """Pure-garbage payload after a valid header: ValueError or a decoded
    signal, never an uncontrolled exception."""
    rng = np.random.default_rng(12)
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    x = make_clip(44100, 0.2)
    bs = codec.encode(x, cfg)
    head = bs[:bitstream.HEADER_BYTES]
    for trial in range(8):
        body = rng.integers(0, 256, size=len(bs) // 2, dtype=np.uint8)
        try:
            codec.decode(head + body.tobytes())
        except ValueError:
            pass
