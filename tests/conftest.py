"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the fake-backend strategy the reference lacks (SURVEY.md §4): all
multi-chip sharding tests execute on host CPU devices so the suite runs
anywhere; the real TPU is exercised by bench.py.

NOTE: this environment's TPU plugin pins ``jax_platforms`` programmatically
at interpreter startup, so the env var alone is not enough — we must override
via ``jax.config.update`` before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the heavy tier too (full-scale parity/config sweeps/"
             "multi-CLI integration); default runs the fast tier only",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r3 #8): every component keeps smoke
    coverage in the fast tier; full-scale goldens, config sweeps and
    redundant-scale integration runs are the ``heavy`` tier, selected
    with ``--full`` (CI / pre-round gate) so the warm fast tier stays a
    per-commit gate (<5 min on this 1-core host)."""
    if config.getoption("--full"):
        return
    skip_heavy = pytest.mark.skip(
        reason="heavy tier: run with --full")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip_heavy)

# persistent compilation cache: the convnet-zoo tests compile a dozen large
# graphs; cache them across runs so the suite stays fast after first run
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
