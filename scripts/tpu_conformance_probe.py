"""On-HARDWARE bitstream conformance: encode the golden + conformance
clips with the TPU engine on the real chip and measure frame agreement
against the normative spec streams (VERDICT r1 #4; BASELINE.json:5).

    python scripts/tpu_conformance_probe.py

Writes TPU_CONFORMANCE.json at the repo root with per-config agreement.
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from mrcaudiocodec_tpu.config import CodecConfig                 # noqa: E402
from mrcaudiocodec_tpu.spec import codec as scodec               # noqa: E402
from tests.test_conformance import frame_agreement, snr_db       # noqa: E402
from tests.test_golden import make_golden_clip                   # noqa: E402

CONFIGS = [
    ("g1_mono_96", 44100, 1, 96000, {}),
    ("g2_stereo_128", 44100, 2, 128000, {}),
    ("g3_48k_192", 48000, 2, 192000, {}),
    ("g4_no_switch", 44100, 1, 96000, {"window_switching": False}),
    ("g5_32k_64", 32000, 1, 64000, {}),
    ("long_stereo_128_4s", 44100, 2, 128000, {}),
]


def psnr_db(x, y):
    """Peak SNR of decoded PCM vs source, full-scale peak = 1.0
    (BASELINE.json:5 'segmental SNR / PSNR')."""
    mse = float(np.mean((np.asarray(x, np.float64) - y) ** 2))
    return 10 * np.log10(1.0 / (mse + 1e-30))


def main():
    import jax
    from mrcaudiocodec_tpu.models import codec as tcodec
    print("devices:", jax.devices(), flush=True)
    results = {"backend": str(jax.devices()[0])}
    total_same = total_nf = 0
    for name, fs, ch, br, kw in CONFIGS:
        seconds = 4.0 if name.startswith("long") else 0.7
        x = make_golden_clip(fs, seconds, ch)
        cfg = CodecConfig(fs=fs, channels=ch, bitrate=br, **kw)
        bs_spec = scodec.encode(x, cfg)
        bs_tpu = tcodec.encode(x, cfg)
        same, nf = frame_agreement(bs_spec, bs_tpu)
        y, _ = tcodec.decode(bs_tpu)
        y_spec, _ = scodec.decode(bs_spec)
        s = snr_db(x, y)
        byte_eq = bs_spec == bs_tpu
        results[name] = {"frames_identical": int(same), "frames": int(nf),
                         "agreement": round(same / nf, 5),
                         "byte_equal": bool(byte_eq),
                         "decode_snr_db": round(float(s), 2),
                         "psnr_db": round(psnr_db(x, y), 2),
                         "psnr_spec_db": round(psnr_db(x, y_spec), 2),
                         "decode_bitwise_spec": bool(
                             np.array_equal(np.asarray(y, np.float32),
                                            y_spec))}
        total_same += same
        total_nf += nf
        print(f"{name}: {same}/{nf} frames identical, byte_equal={byte_eq}, "
              f"SNR {s:.1f} dB", flush=True)
    results["total_agreement"] = round(total_same / total_nf, 5)
    with open("TPU_CONFORMANCE.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
