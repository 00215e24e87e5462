"""Locate the g3 (48 kHz stereo 192 kbps) spec-vs-TPU divergence by stage.

TPU_CONFORMANCE.json shows g3 at 67/68 records identical while every other
config is byte-equal — post-xmath, so the MDCT is NOT the suspect anymore.
This probe runs the engine's exact chunked pipeline on hardware and
compares every per-frame intermediate bitwise against the spec codec:
block types -> MDCT coeffs -> psycho allowed/PE -> budgets -> RD decisions.

    python scripts/tpu_g3_probe.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from mrcaudiocodec_tpu import config as C  # noqa: E402
from mrcaudiocodec_tpu import tables as T  # noqa: E402
from mrcaudiocodec_tpu.config import CodecConfig  # noqa: E402
from mrcaudiocodec_tpu.spec import codec as scodec  # noqa: E402
from mrcaudiocodec_tpu.spec import dsp as sdsp  # noqa: E402
from mrcaudiocodec_tpu.spec import psycho as spsycho  # noqa: E402
from mrcaudiocodec_tpu.spec import rd as srd  # noqa: E402
from mrcaudiocodec_tpu.spec import reservoir as sres  # noqa: E402
from tests.test_golden import make_golden_clip  # noqa: E402


def spec_stages(x1, cfg):
    frames = sdsp.frame_signal(x1)
    nf = len(frames)
    tr = sdsp.detect_transients(frames)
    bt = sdsp.block_types(tr, cfg.window_switching)
    lay = T.unified_layout(cfg.fs)
    coeffs = np.zeros((nf, C.LONG_COEFFS), np.float32)
    allowed = np.zeros((nf, lay["nb"]), np.float32)
    pe = np.zeros(nf, np.float32)
    for f in range(nf):
        coeffs[f] = sdsp.analyze_frame(frames[f], int(bt[f]), cfg.window)
        allowed[f], pe[f], _ = spsycho.analyze_frame(
            frames[f], coeffs[f], int(bt[f]), cfg.fs, cfg.full_psycho)
    budgets = sres.allocate(pe, cfg)
    q = np.zeros((nf, C.LONG_COEFFS), np.int32)
    amp = np.zeros((nf, lay["nb"]), np.int32)
    gain = np.zeros(nf, np.int32)
    for f in range(nf):
        q[f], amp[f], gain[f], _ = srd.rd_frame(
            coeffs[f], allowed[f], int(budgets[f]), int(bt[f]), cfg.fs)
    return dict(bt=np.asarray(bt), coeffs=coeffs, allowed=allowed, pe=pe,
                budgets=np.asarray(budgets), q=q, amp=amp, gain=gain)


def engine_stages(x, cfg):
    """Mirror models/encoder.encode_arrays but keep intermediates."""
    import jax

    from mrcaudiocodec_tpu.models import encoder as enc

    n, nch = x.shape
    nf = cfg.frames_for_samples(n)
    sizes = enc._chunk_schedule(nf)
    starts = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    P = enc._padded_rows(x, int(starts[-1]))
    chunks, budgets = enc._analyze_all(P, sizes, starts, nf, cfg)
    bts, cos, als = [], [], []
    outs = []
    for c in range(len(sizes)):
        bt, co, al, pe = chunks[c]
        b = budgets[:, int(starts[c]):int(starts[c + 1])]
        outs.append(enc._rd_chunk(co, al, b, bt, cfg.fs))
        bts.append(np.asarray(bt))
        cos.append(np.asarray(co))
        als.append(np.asarray(al))
    host = jax.device_get(outs)
    cat = lambda xs: np.concatenate(xs, axis=1)[:, :nf]
    res = dict(bt=cat(bts), coeffs=cat(cos), allowed=cat(als),
               budgets=np.asarray(budgets)[:, :nf],
               q=cat([np.asarray(h[0]) for h in host]).astype(np.int32),
               amp=cat([np.asarray(h[1]) for h in host]).astype(np.int32),
               gain=cat([np.asarray(h[2]) for h in host]).astype(np.int32))
    return res, nf


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    fs = 48000
    cfg = CodecConfig(fs=fs, channels=2, bitrate=192000)
    x = make_golden_clip(fs, 0.7, 2)
    eng, nf = engine_stages(x, cfg)
    print(f"nf={nf}", flush=True)
    for ch in range(2):
        sp = spec_stages(x[:, ch], cfg)
        for key in ("bt", "coeffs", "allowed", "budgets",
                    "gain", "amp", "q"):
            a, b = sp[key], eng[key][ch]
            if a.shape != b.shape:
                print(f"ch{ch} {key}: SHAPE {a.shape} vs {b.shape}")
                continue
            if np.array_equal(a, b):
                print(f"ch{ch} {key}: identical")
                continue
            if a.ndim == 1:
                bad = np.where(a != b)[0]
                print(f"ch{ch} {key}: {len(bad)} diffs at frames {bad[:8]}"
                      f" spec={a[bad[:4]]} eng={b[bad[:4]]}")
            else:
                badf = np.where((a != b).any(axis=-1))[0]
                print(f"ch{ch} {key}: {len(badf)} frames differ "
                      f"{badf[:8]}")
                f0 = int(badf[0])
                idx = np.where(a[f0] != b[f0])[0][:6]
                av, bv = a[f0][idx], b[f0][idx]
                print(f"   frame {f0} idx {idx}: spec={av} eng={bv}")
                if a.dtype == np.float32:
                    ulp = (av.view(np.int32).astype(np.int64)
                           - bv.view(np.int32).astype(np.int64))
                    print(f"   ulp deltas: {ulp}")


if __name__ == "__main__":
    main()
