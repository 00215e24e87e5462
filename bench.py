"""Benchmark harness (SURVEY.md §2b N12).

Measures the headline metric (BASELINE.json:2/5): encode realtime factor
per chip at 128 kbps stereo 44.1 kHz, reported relative to the normative
spec-Python codec's realtime factor ("vs_baseline" = tpu_rtf / spec_rtf,
target >= 100x).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Run `python bench.py --full` for the per-stage breakdown and extra metrics
(frames/s, decode RTF, segmental SNR vs spec) on stderr.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_clip(fs: int, seconds: float, channels: int, seed=0):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    x = np.zeros(n, np.float32)
    # music-like: evolving tone stack + noise floor + periodic transients
    for f0, a in [(220, 0.3), (440, 0.2), (1320, 0.12), (3520, 0.07)]:
        x += (a * np.sin(2 * np.pi * f0 * t + 0.1 * np.sin(2 * np.pi * 0.5 * t))
              ).astype(np.float32)
    x += (0.02 * rng.standard_normal(n)).astype(np.float32)
    for pos in range(fs // 2, n - 300, int(0.7 * fs)):
        x[pos:pos + 96] += (0.5 * rng.standard_normal(96)).astype(np.float32)
    x = np.clip(x, -1, 1)
    if channels == 2:
        return np.stack([x, np.roll(x, 11) * 0.9], axis=1)
    return x[:, None]


def psnr(x, y):
    """Peak SNR of decoded PCM (full-scale peak = 1.0) — BASELINE.json:5
    names both 'segmental SNR / PSNR'; report both."""
    mse = float(np.mean((np.asarray(x, np.float64) - y) ** 2))
    return 10 * np.log10(1.0 / (mse + 1e-30))


def segmental_snr(x, y, seg=1024):
    n = (len(x) // seg) * seg
    xs = x[:n].reshape(-1, seg)
    ys = y[:n].reshape(-1, seg)
    num = (xs ** 2).mean(axis=1)
    den = ((xs - ys) ** 2).mean(axis=1)
    keep = num > 1e-8
    return float(np.mean(10 * np.log10((num[keep] + 1e-30)
                                       / (den[keep] + 1e-30))))


def kernel_roofline():
    """Isolated MDCT / psycho / RD executable throughput + roofline
    utilization (BASELINE.json:5 'speed-of-light per chip'). stderr only."""
    import jax
    import jax.numpy as jnp

    from mrcaudiocodec_tpu import config as C
    from mrcaudiocodec_tpu.models.encoder import (_analyze_chunk, _rd_chunk,
                                                  ENC_CHUNK)

    rng = np.random.default_rng(0)
    fs = 44100
    ext = jnp.asarray((0.2 * rng.standard_normal(
        ((ENC_CHUNK + 3) * C.HOP,))).astype(np.float32))
    out = _analyze_chunk(ext, fs, True, True, "sine")
    jax.block_until_ready(out)

    def sync(o):
        # a tiny device->host readback is the only reliable fence on the
        # axon tunnel (block_until_ready returns early there)
        leaves = jax.tree.leaves(o)
        np.asarray(leaves[0].ravel()[:1])

    def bench_fn(fn, n=10):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        sync(o)
        return (time.perf_counter() - t0) / n

    dt_a = bench_fn(lambda: _analyze_chunk(ext, fs, True, True, "sine"))
    bt, co, al, pe = out
    bud = jnp.full((ENC_CHUNK,), 1486, jnp.int32)
    dt_r = bench_fn(lambda: _rd_chunk(co, al, bud, bt, fs))

    f = ENC_CHUNK
    # MEASURED device duty cycles (jax.profiler trace, v5e 2026-08-20/21,
    # scripts/tpu_profile.py + PROFILE_SUMMARY.json): per warm dispatch,
    # the rd executable is ~92% device-busy (16.2 ms device / 17.7 ms
    # wall) while analyze is ~35% (0.8-0.9 ms device / 2.4 ms wall) — and
    # a WHOLE warm encode shows ~60 ms of top-level device spans inside a
    # ~210 ms wall: the pipeline is dispatch-gap-bound on the tunnelled
    # axon PJRT, not FLOP-bound. The analytic FLOP counts below are
    # workload estimates for scale, not a utilization claim.
    MEAS_DUTY_RD = 0.92
    MEAS_DUTY_ANALYZE = 0.35
    mdct_flops = f * (2 * 1024 * 1024 + 8 * 2 * 128 * 128) * 2  # both paths
    fft_flops = f * (5 * 2048 * 11 + 8 * 5 * 256 * 8)
    evals = 40 + 3 * 17                       # iter1 + ~3 refine iters
    rd_mm_flops = f * evals * (512 * 88 * 2 * 6 + 1024 * 88 * 2)
    peak = 197e12                              # v5e bf16 peak FLOPs/s
    log(f"[kernels] analyze[{f}]: {dt_a*1e3:.1f} ms wall "
        f"(~{dt_a*MEAS_DUTY_ANALYZE*1e3:.1f} ms device at measured "
        f"{MEAS_DUTY_ANALYZE:.0%} duty; {f/dt_a:.0f} frames/s, "
        f"~{(mdct_flops+fft_flops)/dt_a/1e12:.2f} TFLOP/s est)")
    log(f"[kernels] rd[{f}]: {dt_r*1e3:.1f} ms wall "
        f"(~{dt_r*MEAS_DUTY_RD*1e3:.1f} ms device at measured "
        f"{MEAS_DUTY_RD:.0%} duty; {f/dt_r:.0f} frames/s, "
        f"~{rd_mm_flops/dt_r/1e12:.2f} TFLOP/s est, "
        f"{(rd_mm_flops/dt_r)/peak*100:.1f}% of bf16 peak)")
    bytes_a = f * (2048 * 4 + 1024 * 4 + 88 * 4 * 2)
    log(f"[kernels] analyze HBM traffic ~{bytes_a/1e6:.1f} MB "
        f"-> {bytes_a/dt_a/1e9:.0f} GB/s of ~820 GB/s v5e HBM")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="extra metrics on stderr")
    ap.add_argument("--kernels", action="store_true",
                    help="isolated kernel throughput + roofline on stderr")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--spec-seconds", type=float, default=4.0,
                    help="clip length for the (slow) spec-Python baseline")
    args = ap.parse_args()
    if args.kernels:
        kernel_roofline()

    from mrcaudiocodec_tpu.config import CodecConfig
    from mrcaudiocodec_tpu.spec import codec as scodec

    fs, channels, bitrate = 44100, 2, 128000
    cfg = CodecConfig(fs=fs, channels=channels, bitrate=bitrate)

    def to_i16(xf):
        return np.clip(np.round(xf * 32768.0), -32768, 32767).astype(np.int16)

    # --- spec-Python baseline RTF (the denominator, SURVEY.md §6).
    # Both engines see 16-bit source material (the realistic input): the
    # spec codec takes the float view x/32768, the TPU path the raw int16
    # (bit-identical values — tests/test_int16_path.py).
    xi_spec = to_i16(make_clip(fs, args.spec_seconds, channels))
    x_spec = xi_spec.astype(np.float32) / np.float32(32768.0)
    scodec.encode(x_spec[:fs], cfg)      # steady state: build table caches
    spec_dt = 1e30
    for _ in range(3):                   # best-of, like the engine trials
        t0 = time.perf_counter()
        bs_spec = scodec.encode(x_spec, cfg)
        spec_dt = min(spec_dt, time.perf_counter() - t0)
    spec_rtf = args.spec_seconds / spec_dt
    log(f"spec-Python encode: {spec_dt:.2f}s for {args.spec_seconds}s "
        f"-> RTF {spec_rtf:.2f}x")

    # --- TPU path RTF (steady state: warm-up run compiles, later runs time)
    from mrcaudiocodec_tpu.models import codec as tcodec
    xi = to_i16(make_clip(fs, args.seconds, channels))
    x = xi.astype(np.float32) / np.float32(32768.0)
    t0 = time.perf_counter()
    bs_warm = tcodec.encode(xi, cfg)
    warm_dt = time.perf_counter() - t0
    log(f"tpu encode warm-up (incl. compile): {warm_dt:.2f}s")
    # the tunnelled PJRT's H2D throughput varies a lot run-to-run (r5
    # probes: the relay serializes every transfer, ~30 ms fixed cost per
    # transfer + 25-60 MB/s marginal depending on tunnel state, and
    # compresses on the wire); 16 trials + best-of is the steady-state
    # metric, robust to transient tunnel congestion
    trials = []
    for _ in range(16):
        t0 = time.perf_counter()
        bs = tcodec.encode(xi, cfg)
        trials.append(time.perf_counter() - t0)
    best = min(trials)
    log(f"trial spread: best {best*1e3:.0f} ms, median "
        f"{sorted(trials)[len(trials)//2]*1e3:.0f} ms, worst "
        f"{max(trials)*1e3:.0f} ms")
    tpu_dt = best
    tpu_rtf = args.seconds / tpu_dt
    nf = int(np.ceil(x.shape[0] / 1024)) + 1
    log(f"tpu encode: {tpu_dt:.2f}s for {args.seconds}s stereo "
        f"-> RTF {tpu_rtf:.1f}x ({nf * channels / tpu_dt:.0f} frames/s), "
        f"rate {len(bs) * 8 / args.seconds / 1000:.1f} kbps")

    # --- device-resident RTF: the same executables with the audio already
    # in HBM — separates the codec's own speed from the sandbox tunnel's
    # serialized wire (~140-170 ms for the 5.3 MB upload alone, DESIGN.md
    # §4e); this is what a real PCIe host sees. Reported as a
    # supplementary field; "value" stays the honest end-to-end number.
    import jax
    import jax.numpy as jnp

    from mrcaudiocodec_tpu import config as C
    from mrcaudiocodec_tpu.models import encoder as enc
    from mrcaudiocodec_tpu.ops.device_pack import record_cap_bytes

    nf1 = cfg.frames_for_samples(xi.shape[0])
    sizes = enc._chunk_schedule(nf1)
    starts = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    P = enc._padded_rows(xi, int(starts[-1]))
    cap = record_cap_bytes(cfg)
    devs = [jax.device_put(
        P[:, int(starts[c]) * C.HOP:
           (int(starts[c]) + sizes[c] + 3) * C.HOP])
        for c in range(len(sizes))]

    def fence(o):
        np.asarray(jax.device_get(jax.tree.leaves(o)[0].ravel()[:1]))

    def run_dev():
        chunks = [enc._analyze_chunk(d, cfg.fs, cfg.window_switching,
                                     cfg.full_psycho, cfg.window)
                  for d in devs]
        pes = [ch[3] for ch in chunks]
        pe_full = pes[0] if len(pes) == 1 else jnp.concatenate(pes, axis=1)
        budgets = enc._budget_stage(pe_full, jnp.int32(nf1),
                                    int(cfg.mean_frame_bits),
                                    cfg.reservoir_cap, cfg.reservoir)
        return [enc._rd_pack_chunk(ch[1], ch[2],
                                   budgets[:, int(starts[c]):
                                           int(starts[c + 1])],
                                   ch[0], cfg.fs, cap)
                for c, ch in enumerate(chunks)]

    fence(run_dev()[-1])
    dev_dt = 1e30
    for _ in range(4):
        t0 = time.perf_counter()
        fence(run_dev()[-1])
        dev_dt = min(dev_dt, time.perf_counter() - t0)
    dev_rtf = args.seconds / dev_dt
    log(f"device-resident encode (audio pre-staged in HBM): "
        f"{dev_dt*1e3:.0f} ms -> RTF {dev_rtf:.0f}x")

    # --- quality vs the normative spec codec: SAME clip, SAME duration,
    # equal bitrate through both engines (BASELINE.json:2,5). The spec
    # stream bs_spec above already encodes xi_spec; the TPU engine encodes
    # the identical samples and each engine decodes its own stream.
    bs_tpu_q = tcodec.encode(xi_spec, cfg)
    y_tpu_q, _ = tcodec.decode(bs_tpu_q)
    y_spec_q, _ = scodec.decode(bs_spec)
    ssnr_tpu = segmental_snr(x_spec[:, 0], y_tpu_q[:, 0])
    ssnr_spec = segmental_snr(x_spec[:, 0], y_spec_q[:, 0])
    psnr_tpu = psnr(x_spec, y_tpu_q)
    psnr_spec = psnr(x_spec, y_spec_q)
    same_stream = bs_tpu_q == bs_spec
    log(f"quality ({args.spec_seconds}s clip @128 kbps): "
        f"segSNR tpu {ssnr_tpu:.2f} dB vs spec {ssnr_spec:.2f} dB; "
        f"PSNR tpu {psnr_tpu:.2f} dB vs spec {psnr_spec:.2f} dB; "
        f"streams {'byte-identical' if same_stream else 'differ'}")

    if args.full:
        y, _ = tcodec.decode(bs, pcm_dtype="int16")   # warm (compiles)
        t0 = time.perf_counter()
        y, _ = tcodec.decode(bs, pcm_dtype="int16")
        dec_dt = time.perf_counter() - t0
        log(f"tpu decode RTF {args.seconds / dec_dt:.1f}x")

        # decode with the parsed records pre-staged in HBM (PCIe-host view)
        from mrcaudiocodec_tpu.models import decoder as mdec
        from mrcaudiocodec_tpu.spec import bitstream as sbs
        dcfg, dnf, _, _ = sbs.read_header(bs)
        q, e_band, btr = mdec.parse_records(bs)
        dsz = enc._chunk_schedule(dnf, mdec.DEC_CHUNK)
        dbounds = np.concatenate([[0], np.cumsum(dsz)]).astype(int)
        nfp = int(dbounds[-1])
        lay_nb = e_band.shape[-1]
        qc = np.zeros((dcfg.channels, nfp, 1024), np.int16)
        ec = np.zeros((dcfg.channels, nfp, lay_nb), np.int16)
        bc = np.zeros((dcfg.channels, nfp), np.int8)
        qc[:, :dnf] = np.swapaxes(q.reshape(dnf, dcfg.channels, -1), 0, 1)
        ec[:, :dnf] = np.swapaxes(
            e_band.reshape(dnf, dcfg.channels, -1), 0, 1)
        bc[:, :dnf] = btr.reshape(dnf, dcfg.channels).T
        slabs = [(jax.device_put(jnp.asarray(qc[:, a:b])),
                  jax.device_put(jnp.asarray(ec[:, a:b])),
                  jax.device_put(jnp.asarray(bc[:, a:b])))
                 for a, b in zip(dbounds[:-1], dbounds[1:])]

        def run_dec():
            return [mdec._synth_chunk(qs, es, bs_, dcfg.fs, dcfg.window,
                                      True) for qs, es, bs_ in slabs]

        fence(run_dec()[-1])
        ddt = 1e30
        for _ in range(4):
            t0 = time.perf_counter()
            fence(run_dec()[-1])
            ddt = min(ddt, time.perf_counter() - t0)
        log(f"device-resident decode (records pre-staged in HBM): "
            f"{ddt*1e3:.0f} ms -> RTF {args.seconds / ddt:.0f}x")

    print(json.dumps({
        "metric": "encode_realtime_factor_per_chip_128kbps_stereo",
        "value": round(tpu_rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(tpu_rtf / spec_rtf, 2),
        "seg_snr_db": round(ssnr_tpu, 2),
        "seg_snr_spec_db": round(ssnr_spec, 2),
        "seg_snr_vs_spec_db": round(ssnr_tpu - ssnr_spec, 2),
        "psnr_db": round(psnr_tpu, 2),
        "psnr_spec_db": round(psnr_spec, 2),
        "device_resident_rtf": round(dev_rtf, 1),
        "stream_matches_spec": same_stream,
    }))


if __name__ == "__main__":
    main()
