"""Bisect the simple-mode band_t divergence on TPU: which single op in
e_part -> t_part -> max(ath) -> /counts -> min -> *width rounds
differently from NumPy?

    python scripts/tpu_div_probe.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from mrcaudiocodec_tpu import config as C  # noqa: E402
from mrcaudiocodec_tpu import xpsy  # noqa: E402


def bits(a):
    return np.asarray(a, np.float32).view(np.int32)


def cmp(name, got, ref):
    got, ref = np.asarray(got), np.asarray(ref)
    eq = np.array_equal(bits(got), bits(ref))
    d = bits(got).astype(np.int64) - bits(ref).astype(np.int64)
    nd = int((d != 0).sum())
    print(f"  {name}: {'EQUAL' if eq else f'{nd}/{d.size} differ, max ulp '+str(np.abs(d).max())}")
    return eq


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    nf = 64
    fs = 44100
    frames = (0.4 * rng.standard_normal((nf, C.LONG_SIZE))).astype(np.float32)
    cst = xpsy.psy_tables(fs, True)

    # numpy chain
    p_np = xpsy.rfft_power(frames * cst["hann"], np)
    pfl_np = np.maximum(p_np, xpsy.SFM_FLOOR_REL
                        * np.max(p_np, axis=-1, keepdims=True))
    ep_np = xpsy.seg_sums(pfl_np, cst["part_edges"], np)
    tp_np = ep_np * xpsy._SIMPLE_FACTOR
    tpm_np = np.maximum(tp_np, cst["ath_part"])
    dens_np = tpm_np / cst["counts"]
    big = np.float32(1e30)
    dmask_np = np.where(cst["pb_mask"], dens_np[..., :, None], big)
    bt_np = dmask_np.min(axis=-2) * cst["width"]

    @jax.jit
    def chain(fr):
        p = xpsy.rfft_power(fr * jnp.asarray(cst["hann"]), jnp)
        pfl = jnp.maximum(p, xpsy.SFM_FLOOR_REL
                          * jnp.max(p, axis=-1, keepdims=True))
        ep = xpsy.seg_sums(pfl, cst["part_edges"], jnp)
        tp = ep * xpsy._SIMPLE_FACTOR
        tpm = jnp.maximum(tp, jnp.asarray(cst["ath_part"]))
        dens = tpm / jnp.asarray(cst["counts"])
        dmask = jnp.where(jnp.asarray(cst["pb_mask"]),
                          dens[..., :, None], jnp.float32(1e30))
        bt_ = dmask.min(axis=-2) * jnp.asarray(cst["width"])
        return p, pfl, ep, tp, tpm, dens, bt_

    p, pfl, ep, tp, tpm, dens, bt_ = [np.asarray(v)
                                      for v in chain(jnp.asarray(frames))]
    cmp("p (rfft_power)", p, p_np)
    cmp("p floored", pfl, pfl_np)
    cmp("e_part", ep, ep_np)
    cmp("t_part (mul)", tp, tp_np)
    cmp("max ath", tpm, tpm_np)
    cmp("dens (divide)", dens, dens_np)
    cmp("band_t", bt_, bt_np)

    # isolated divide check on the same operand values
    x = tpm_np.reshape(-1)
    y = np.broadcast_to(cst["counts"], tpm_np.shape).reshape(-1).copy()
    d_tpu = np.asarray(jax.jit(lambda a, b: a / b)(jnp.asarray(x),
                                                   jnp.asarray(y)))
    cmp("isolated divide", d_tpu, x / y)
    # isolated sqrt on dens values
    s_tpu = np.asarray(jax.jit(jnp.sqrt)(jnp.asarray(np.abs(x))))
    cmp("isolated sqrt", s_tpu, np.sqrt(np.abs(x)))


if __name__ == "__main__":
    main()
