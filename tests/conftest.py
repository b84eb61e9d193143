"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4).

The image's JAX install force-registers a tunneled TPU platform ("axon")
and pins ``jax_platforms="axon,cpu"`` regardless of ``JAX_PLATFORMS`` —
unit tests must not round-trip every op through the tunnel, so we override
the config after import. Set ``SBR_TEST_PLATFORM`` to run the suite
against another platform explicitly.
"""

import os

_platform = os.environ.get("SBR_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
