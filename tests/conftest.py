"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere, hence conftest.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin does not honor the JAX_PLATFORMS env var; force CPU
# through the config API so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the suite is compile-bound on small CPU
# hosts; repeated runs hit the cache instead of recompiling
_CACHE_DIR = "/tmp/jax_test_cache"

# A pytest run killed mid-compile truncates the entry being written, and
# XLA hard-aborts ("Fatal Python error: Aborted") on deserializing it in
# the NEXT run. Detect the dirty shutdown via a per-PID session marker
# (a marker whose PID is dead = that session crashed) and drop only the
# entries written during that session (everything newer than the stale
# marker) — the rest of the cache stays warm, and a concurrently RUNNING
# pytest session's live marker is left alone.
os.makedirs(_CACHE_DIR, exist_ok=True)
_MARKER = os.path.join(_CACHE_DIR, ".suite_running.%d" % os.getpid())


def _pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


for _fn in os.listdir(_CACHE_DIR):
    if not _fn.startswith(".suite_running"):
        continue
    _mp = os.path.join(_CACHE_DIR, _fn)
    _sfx = _fn.rsplit(".", 1)[-1]
    if _sfx.isdigit() and _pid_alive(int(_sfx)):
        continue  # live concurrent session — not a crash
    try:
        _t0 = os.path.getmtime(_mp) - 1.0
    except OSError:
        continue
    for _cn in os.listdir(_CACHE_DIR):
        _p = os.path.join(_CACHE_DIR, _cn)
        try:
            if not _cn.startswith(".suite_running") and os.path.getmtime(_p) >= _t0:
                os.remove(_p)
        except OSError:
            pass
    try:
        os.remove(_mp)
    except OSError:
        pass
with open(_MARKER, "w") as _f:
    _f.write(str(os.getpid()))

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_raise_persistent_cache_errors", False)


def pytest_sessionfinish(session, exitstatus):
    # clean shutdown: this session's cache entries are intact, keep them
    try:
        os.remove(_MARKER)
    except OSError:
        pass
