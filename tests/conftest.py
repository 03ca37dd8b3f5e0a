"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (multi-chip paths validated on a virtual mesh).

The session environment boots an `axon` remote-TPU PJRT plugin via
sitecustomize and pins jax_platforms="axon,cpu" through jax.config (the env
var alone is NOT enough to undo that) with remote compilation — which makes
unit tests orders of magnitude slower. Re-pin to CPU here, before any test
imports trigger backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402

# compile-heavy e2e modules (minutes each on CPU): auto-marked `slow` so the
# practical dev loop is `pytest -m "not slow"` (~2 min) and CI runs the rest
_SLOW_MODULES = {
    "test_event_slam", "test_event_continuous", "test_ev_image_slam",
    "test_event_inertial", "test_fusion", "test_vi_slam", "test_apps",
    "test_recovery", "test_stereo_rgbd", "test_loop_closing",
    "test_kf_lifecycle",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
