"""Persistent-compilation-cache setup, keyed by a host fingerprint.

XLA:CPU persistent-cache entries are AOT machine code compiled for the exact
CPU feature set of the compiling host; jax's cache key does NOT include those
features, so entries written on one machine silently load on another
("Machine type used for XLA:CPU compilation doesn't match the machine type
for execution ... could lead to execution errors such as SIGILL") and can
misexecute — observed here as a one-off NaN-loss test failure after the
session moved hosts.  Keying the cache DIRECTORY by a digest of the host's
CPU flags makes a host switch start a fresh cache instead of loading foreign
machine code.  TPU entries are host-independent but recompiling them once per
new host is cheap relative to a wrong-numerics debugging session.
"""
import hashlib
import os
import platform


def _host_fingerprint() -> str:
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_persistent_cache(jax_config, min_compile_secs: float = 1.0) -> str:
    """Point jax at a host-fingerprinted persistent compilation cache dir.

    Call with `jax.config` before the first compilation. Returns the dir."""
    cache_dir = os.path.expanduser(
        f"~/.cache/jax_comp_cache_{_host_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax_config.update("jax_compilation_cache_dir", cache_dir)
    jax_config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
