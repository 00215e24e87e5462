"""On-HARDWARE bitwise check of the rev-4 psycho chain (xpsy.py): the jnp
instantiation on the TPU must equal the NumPy spec EXACTLY — the same
property scripts/tpu_xmath_probe.py establishes for the MDCT.

    python scripts/tpu_psycho_probe.py

Checks, per family (long/short) and for full_psycho on/off:
  band_t / band_e / pe bitwise vs NumPy, plus the unified-layout MDCT
  band energies, plus the end-to-end _analyze_block outputs.
"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from mrcaudiocodec_tpu import config as C  # noqa: E402
from mrcaudiocodec_tpu import tables as T  # noqa: E402
from mrcaudiocodec_tpu import xpsy  # noqa: E402


def bits(a):
    return np.asarray(a, np.float32).view(np.int32)


def cmp(name, got, ref):
    got, ref = np.asarray(got), np.asarray(ref)
    eq = np.array_equal(bits(got), bits(ref))
    if eq:
        print(f"  {name}: bitwise EQUAL")
    else:
        d = bits(got).astype(np.int64) - bits(ref).astype(np.int64)
        nd = int((d != 0).sum())
        print(f"  {name}: {nd}/{d.size} differ, max ulp {np.abs(d).max()}")
    return eq


def main():
    import jax
    import jax.numpy as jnp
    import mrcaudiocodec_tpu.models  # noqa: F401 (persistent compile cache)
    from mrcaudiocodec_tpu.ops import psycho as opsy

    print("devices:", jax.devices(), flush=True)
    assert jax.default_backend() == "tpu", "run on the TPU"
    rng = np.random.default_rng(7)
    nf = 256
    frames = (0.4 * rng.standard_normal((nf, C.LONG_SIZE))).astype(np.float32)
    coeffs = rng.standard_normal((nf, C.LONG_COEFFS)).astype(np.float32)
    ok = True
    fs = 44100
    for full in (True, False):
        for long_block in (True, False):
            cst = xpsy.psy_tables(fs, long_block)
            if long_block:
                p = xpsy.rfft_power(frames * cst["hann"], np)
                bt_np, be_np = xpsy.block_thresholds(p, cst, full, np)
                pe_np = xpsy.band_pe(be_np, bt_np, cst["width"], np)
            else:
                off = C.SHORT_OFFSET
                subs = np.stack(
                    [frames[:, off + g * C.SHORT_COEFFS:
                            off + g * C.SHORT_COEFFS + C.SHORT_SIZE]
                     for g in range(C.N_SHORT)], axis=1)
                p = xpsy.rfft_power(subs * cst["hann"], np)
                bt_np, be_np = xpsy.block_thresholds(p, cst, full, np)
                pe_np = xpsy.groups_pe(be_np, bt_np, cst["width"], np)
                bt_np = bt_np.reshape(nf, -1)
                be_np = be_np.reshape(nf, -1)
            fam = jax.jit(lambda fr: opsy._psy_family_jnp(
                fr, fs, long_block, full))
            t, e, pe = [np.asarray(v) for v in fam(jnp.asarray(frames))]
            tag = f"{'long' if long_block else 'short'} full={full}"
            print(tag, flush=True)
            ok &= cmp("band_t", t, bt_np)
            ok &= cmp("band_e", e, be_np)
            ok &= cmp("pe", pe, pe_np)

    lay = T.unified_layout(fs)
    from mrcaudiocodec_tpu.spec.psycho import mdct_band_energy
    for btype in (C.LONG, C.SHORT):
        edges = lay["edges"][btype]
        ref = mdct_band_energy(coeffs, edges)
        got = jax.jit(lambda c: opsy._band_energy(
            c, tuple(int(v) for v in edges)))(jnp.asarray(coeffs))
        ok &= cmp(f"band_energy bt={btype}", got, ref)

    # end-to-end block vs spec per-frame
    from mrcaudiocodec_tpu.spec import psycho as spsy
    bt_arr = (rng.integers(0, 2, nf) * 2).astype(np.int32)   # LONG/SHORT mix
    al_ref = np.zeros((nf, lay["nb"]), np.float32)
    pe_ref = np.zeros(nf, np.float32)
    for i in range(nf):
        al_ref[i], pe_ref[i], _ = spsy.analyze_frame(
            frames[i], coeffs[i], int(bt_arr[i]), fs, True)
    al, pe2, _ = jax.jit(
        lambda f, c, b: opsy._analyze_block(f, c, b, fs, True))(
        jnp.asarray(frames), jnp.asarray(coeffs), jnp.asarray(bt_arr))
    ok &= cmp("allowed (end-to-end)", al, al_ref)
    ok &= cmp("pe (end-to-end)", pe2, pe_ref)
    print("ALL BITWISE EQUAL" if ok else "DIVERGENCE — see above", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
