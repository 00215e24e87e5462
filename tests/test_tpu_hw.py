"""On-HARDWARE kernel bit-equality suite (VERDICT r4 next-step 9).

The Mosaic/Pallas bit-equality evidence used to live in one-off
`scripts/tpu_*probe*` runs whose results were committed prose; this
marker-gated suite makes it reproducible in one command:

    MRC_TESTS_KEEP_TPU=1 python -m pytest tests -m tpu_hw -q

Skipped entirely off-TPU (the default CPU suite still exercises the same
code paths in interpret/XLA:CPU form — tests/test_pallas.py). Emits one
JSON artifact, TPU_HW_SUITE.json, with a pass/fail + metric per check.
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu_hw

FS = 44100


def _on_tpu() -> bool:
    if not os.environ.get("MRC_TESTS_KEEP_TPU"):
        return False
    import jax
    return jax.default_backend() != "cpu"


@pytest.fixture(scope="module")
def hw(request):
    if not _on_tpu():
        pytest.skip("hardware suite needs MRC_TESTS_KEEP_TPU=1 + a TPU")
    import jax
    results = {"backend": str(jax.devices()[0])}

    def record(name, payload):
        results[name] = payload

    yield record
    with open("TPU_HW_SUITE.json", "w") as f:
        json.dump(results, f, indent=1)


def _frames(nf=128, seed=7):
    from mrcaudiocodec_tpu import config as C
    from mrcaudiocodec_tpu.spec import dsp as sdsp
    rng = np.random.default_rng(seed)
    x = np.clip(0.3 * rng.standard_normal(nf * C.HOP + C.HOP),
                -1, 1).astype(np.float32)
    for pos in range(C.HOP, len(x) - 200, 5 * C.HOP):
        x[pos:pos + 64] += (0.6 * rng.standard_normal(64)).astype(np.float32)
    frames = sdsp.frame_signal(x)
    bt = sdsp.block_types(sdsp.detect_transients(frames), True)
    return frames, bt


def test_xmath_fft_kernel_bitwise(hw):
    """The fused Pallas DIF-FFT MDCT (ops/pallas/xmath_kernel, dispatched
    inside ops.dsp.analyze on TPU) must reproduce the NumPy spec MDCT
    BITWISE — the kernel body is the normative arithmetic."""
    import jax.numpy as jnp
    from mrcaudiocodec_tpu.ops import dsp as odsp
    from mrcaudiocodec_tpu.spec import dsp as sdsp

    frames, bt = _frames()
    want = sdsp.analyze_frames(frames, bt, "sine")
    got = np.asarray(odsp.analyze(jnp.asarray(frames),
                                  jnp.asarray(bt), "sine"))
    neq = int((want.view(np.int32) != got.view(np.int32)).sum())
    hw("xmath_fft_kernel", {"mismatched_values": neq,
                            "total": int(want.size), "bitwise": neq == 0})
    assert neq == 0


def test_psycho_chain_bitwise(hw):
    """The jnp psycho chain (shared xpsy sequences) must be bitwise equal
    to the NumPy spec on hardware (rev-4 claim, scripts/tpu_psycho_probe)."""
    import jax.numpy as jnp
    from mrcaudiocodec_tpu.ops import dsp as odsp, psycho as opsy
    from mrcaudiocodec_tpu.spec import psycho as spsy
    from mrcaudiocodec_tpu.spec import dsp as sdsp

    frames, bt = _frames(seed=11)
    coeffs = sdsp.analyze_frames(frames, bt, "sine")
    want_allowed, want_pe, _ = spsy.analyze_frames(frames, coeffs, bt, FS,
                                                   True)
    co_dev = odsp.analyze(jnp.asarray(frames), jnp.asarray(bt), "sine")
    got_allowed, got_pe, _ = opsy.analyze(jnp.asarray(frames), co_dev,
                                          jnp.asarray(bt), FS, True)
    neq_a = int((want_allowed.view(np.int32)
                 != np.asarray(got_allowed).view(np.int32)).sum())
    neq_p = int((want_pe.view(np.int32)
                 != np.asarray(got_pe).view(np.int32)).sum())
    hw("psycho_chain", {"allowed_mismatches": neq_a,
                        "pe_mismatches": neq_p,
                        "bitwise": neq_a == 0 and neq_p == 0})
    assert neq_a == 0 and neq_p == 0


@pytest.mark.parametrize("g", [1, 4, 8, 32])
def test_quant_kernel_bit_exact(hw, g):
    """The Pallas quantization-cost kernel (Mosaic-compiled on hardware,
    not interpret mode) must equal the XLA cost path exactly."""
    import jax
    import jax.numpy as jnp
    from mrcaudiocodec_tpu import config as C
    from mrcaudiocodec_tpu import tables as T
    from mrcaudiocodec_tpu.ops import dsp as odsp, rd as ord_
    from mrcaudiocodec_tpu.ops.pallas import quant_kernel

    rng = np.random.default_rng(5)
    frames, bt = _frames(seed=5)
    frames, bt = frames[:128], bt[:128]     # kernel needs F % BLOCK_F == 0
    coeffs = odsp.analyze(jnp.asarray(frames), jnp.asarray(bt), "sine")
    nb = T.unified_layout(FS)["nb"]
    amp = jnp.asarray((rng.integers(0, 13, (len(bt), nb)) * 2)
                      .astype(np.int32))
    base = rng.integers(C.GAIN_MIN, C.GAIN_MAX - g + 1,
                        len(bt)).astype(np.int32)
    gains = jnp.asarray(base[:, None] + np.arange(g, dtype=np.int32))
    btd = jnp.asarray(bt)
    ref = np.asarray(jax.jit(
        lambda c, a, gg, b: ord_._bits_for_gains(c, a, gg, b, FS))(
            coeffs, amp, gains, btd))
    got = np.asarray(jax.jit(
        lambda c, a, gg, b: quant_kernel.bits_for_gains(c, a, gg, b, FS))(
            coeffs, amp, gains, btd))
    neq = int((ref != got).sum())
    hw(f"quant_kernel_g{g}", {"mismatches": neq, "total": int(ref.size),
                              "bit_exact": neq == 0})
    assert neq == 0


def test_encode_stream_byte_equal_smoke(hw):
    """End-to-end hardware smoke: spec and engine streams byte-identical
    on a short switching clip (full conformance: scripts/tpu_conformance_probe)."""
    from mrcaudiocodec_tpu.config import CodecConfig
    from mrcaudiocodec_tpu.models import codec as tcodec
    from mrcaudiocodec_tpu.spec import codec as scodec
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_conformance import make_clip

    cfg = CodecConfig(fs=FS, channels=1, bitrate=96000)
    x = make_clip(FS, 0.6, 1)
    bs_spec = scodec.encode(x, cfg)
    bs_tpu = tcodec.encode(x, cfg)
    hw("encode_smoke", {"byte_equal": bs_spec == bs_tpu,
                        "stream_bytes": len(bs_spec)})
    assert bs_spec == bs_tpu
