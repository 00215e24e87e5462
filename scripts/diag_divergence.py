"""Diagnose spec-vs-TPU frame divergence at minutes scale (test_scale saw
44/28128 differing frames on the CPU backend).

Encodes a long music-like track through both engines on the CPU backend,
finds the differing frame records, and decodes them to report WHICH
decision flipped (block type / gain / amp vector / q).

    python scripts/diag_divergence.py [seconds]
"""
import sys

sys.path.insert(0, ".")

import numpy as np                                          # noqa: E402

import jax                                                  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mrcaudiocodec_tpu import config as C                   # noqa: E402
from mrcaudiocodec_tpu.config import CodecConfig            # noqa: E402
from mrcaudiocodec_tpu.spec import codec as scodec          # noqa: E402
from mrcaudiocodec_tpu.spec import bitstream, entropy       # noqa: E402
from tests.test_scale import make_track                     # noqa: E402


def records_of(bs):
    cfg, n_frames, n_samples, bitpos = bitstream.read_header(bs)
    nrec = n_frames * cfg.channels
    offs, lens = bitstream.frame_byte_offsets(bs, bitpos // 8, nrec)
    recs = []
    for off, ln in zip(offs, lens):
        nbytes = (C.FRAME_LEN_BITS + int(ln) + 7) // 8
        recs.append(bs[int(off):int(off) + nbytes])
    return cfg, recs


def decode_record(rec, fs):
    bits = np.unpackbits(np.frombuffer(rec, np.uint8))
    cur = entropy._Bits(bits, pos=C.FRAME_LEN_BITS)
    try:
        q, e_bin, bt, gain = entropy.decode_frame_content(cur, fs)
        return {"bt": bt, "gain": gain,
                "e": list(np.asarray(e_bin)), "q": list(np.asarray(q))}
    except Exception as e:
        return {"err": repr(e)}


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    fs = 48000
    cfg = CodecConfig(fs=fs, channels=2, bitrate=192000)
    x = make_track(fs, seconds)
    print(f"encoding {seconds}s via spec...", flush=True)
    bs_spec = scodec.encode(x, cfg)
    print("encoding via TPU engine (CPU backend)...", flush=True)
    from mrcaudiocodec_tpu.models import codec as tcodec
    bs_tpu = tcodec.encode(x, cfg)

    _, rec_s = records_of(bs_spec)
    _, rec_t = records_of(bs_tpu)
    assert len(rec_s) == len(rec_t)
    diffs = [i for i, (a, b) in enumerate(zip(rec_s, rec_t)) if a != b]
    print(f"{len(diffs)}/{len(rec_s)} records differ: {diffs[:40]}",
          flush=True)
    for i in diffs[:12]:
        ds = decode_record(rec_s[i], fs)
        dt = decode_record(rec_t[i], fs)
        if "err" in ds or "err" in dt:
            print(f"rec {i}: decode err {ds.get('err')} {dt.get('err')}")
            continue
        msg = [f"rec {i} (ch {i % 2}, t={i // 2 * 1024 / fs:.2f}s):"]
        if ds["bt"] != dt["bt"]:
            msg.append(f"bt {ds['bt']} vs {dt['bt']}")
        if ds["gain"] != dt["gain"]:
            msg.append(f"gain {ds['gain']} vs {dt['gain']}")
        if ds["e"] != dt["e"]:
            de = [(n, a, b) for n, (a, b)
                  in enumerate(zip(ds["e"], dt["e"])) if a != b]
            msg.append(f"e_bin diffs x{len(de)} {de[:6]}")
        if ds["q"] != dt["q"]:
            nq = sum(1 for a, b in zip(ds["q"], dt["q"]) if a != b)
            msg.append(f"q diffs at {nq} bins")
        if len(msg) == 1:
            msg.append("same decoded content (padding only?)")
        print(" ".join(msg), flush=True)


if __name__ == "__main__":
    main()
