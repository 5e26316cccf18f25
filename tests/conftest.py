"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the driver separately dry-runs
the multichip path; see __graft_entry__.dryrun_multichip).

This environment's sitecustomize pre-imports AND initializes jax on the
TPU backend before any test code runs, so in-process env/config changes
are ignored: when the backend is wrong, re-exec the whole pytest process
with the platform pinned (after restoring pytest's captured fds)."""

import os
import sys


def pytest_configure(config):
    if os.environ.get("BT2TPU_TEST_REEXEC") == "1":
        return
    # Do NOT probe jax.default_backend() here: when the axon tunnel is in a
    # hung phase, backend init blocks forever. If the axon plugin would
    # register (PALLAS_AXON_POOL_IPS set), re-exec unconditionally with it
    # cleared so the fresh interpreter never touches the tunnel.
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        import jax

        if jax.default_backend() == "cpu":
            return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["BT2TPU_TEST_REEXEC"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon plugin unregistered
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Cache compiles across test runs (compiles dominate test wall time here).
# Default READ-ONLY in one-process suite runs: the cache-WRITE path
# (executable.serialize() in put_executable_and_time) segfaults after
# enough executables accumulate in one process — reproduced at ~35% of a
# full `pytest tests/` on both CPU and the axon TPU backend, while every
# test file passes in isolation (see utils/jaxcfg.py).  Populate the
# cache by running files in separate processes (or BT2TPU_CACHE_READONLY=0
# for an explicit warming run); the full one-process gate then runs
# entirely on cache READS.
_FULL_SUITE = {"on": False, "count": 0}


def pytest_collection_modifyitems(config, items):
    # Long one-process runs crash once a few hundred tests' worth of
    # compiled executables accumulate: first observed as segfaults in
    # the persistent-cache WRITE (executable.serialize()), then — with
    # writes disabled and a clean warmed cache — as an abort in the
    # cache READ (deserialize_executable), then — with the cache fully
    # disabled — as a segfault inside backend_compile_and_load itself,
    # all at the same ~44% point while every file passes in isolation.
    # The fault tracks ACCUMULATED live executables in jaxlib, not cache
    # entries.  Mitigation for full-suite collections: keep the warmed
    # cache read-only (fast reloads) and jax.clear_caches() every 150
    # tests so the live-executable count stays below the fault
    # threshold.
    if len(items) > 400:
        _FULL_SUITE["on"] = True


def pytest_runtest_teardown(item, nextitem):
    if _FULL_SUITE["on"]:
        _FULL_SUITE["count"] += 1
        if _FULL_SUITE["count"] % 150 == 0:
            jax.clear_caches()


os.environ.setdefault("BT2TPU_CACHE_READONLY", "1")
# pin the package's enable_compile_cache to the TEST cache dir so test
# processes never touch (or get poisoned by) the device-run cache
os.environ.setdefault("BT2TPU_COMPILE_CACHE", "/tmp/jax_compile_cache")
if os.environ.get("BT2TPU_NO_COMPILE_CACHE") != "1":
    _ro = os.environ["BT2TPU_CACHE_READONLY"] == "1"
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      1e18 if _ro else 0.5)
