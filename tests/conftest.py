"""Test harness setup.

The sandbox's axon PJRT plugin force-registers a remote TPU backend from
sitecustomize at interpreter start (see SURVEY.md §2b): `JAX_PLATFORMS=cpu`
in the environment is overridden by that registration. Overriding the
platform via `jax.config` *after* import wins, so we do that here — before
any test imports jax functions — and force an 8-virtual-device CPU platform
for the sharding tests (SURVEY.md §4 "multi-device without a cluster").

Set MRC_TESTS_KEEP_TPU=1 to run the suite against the real TPU instead
(first compile on the axon tunnel takes 50-155 s — be patient).
"""
import os

# small fixed-shape chunks: fast CPU tests + chunk-seam coverage
os.environ.setdefault("MRC_ENC_CHUNK", "128")
os.environ.setdefault("MRC_DEC_CHUNK", "128")

if not os.environ.get("MRC_TESTS_KEEP_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu_hw: on-hardware kernel bit-equality checks "
        "(MRC_TESTS_KEEP_TPU=1 pytest -m tpu_hw); skipped off-TPU")
    config.addinivalue_line(
        "markers",
        "devicepack: keeps MRC_DEVICE_PACK on (production default) for "
        "tests that cover the on-device record packer end to end")
