"""Serialized-executable cache: cut the cold-start compile to a disk load.

Round-3 verdict weak #1: an online-adaptation run pays ~7 min of XLA compile
through the tunneled TPU before its first step, and the persistent HLO-level
compile cache does NOT capture server-side compiles there (CLAUDE.md). This
module caches one level lower — the compiled PjRt executable itself, via
`jax.experimental.serialize_executable` — keyed by the lowered program text +
backend identity, so a warm host skips XLA entirely.

Flow: `warm(jitted, args)` lowers (a cheap host-side trace), hashes the
StableHLO text together with (jax version, platform, device kind, device
count), and either deserializes a hit into a ready `Compiled` or compiles,
serializes, and persists. Donation/sharding semantics are baked into the
executable, so calling the result is exactly calling the jitted function at
those avals — shapes must match, which online adaptation guarantees (the
fused step is one jit per static-spec key on fixed-resolution streams).

The serialized payload includes pickled PyTreeDefs (jax requires the pytree
registrations — e.g. flax struct dataclasses — to be imported before
deserialization; importing the adapter module does that). Not every PjRt
plugin implements executable serialization: `warm` returns None on any
failure and the caller falls back to the plain jit dispatch path.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time


def _host_fingerprint(platform: str) -> str:
    """CPU-feature fingerprint, non-empty only on the cpu platform.

    XLA:CPU serialized executables embed machine code compiled for THIS
    host's ISA extensions; `device_kind` is just "cpu" and does not capture
    them, so after a box migration a stale pickle could SIGILL instead of
    missing. TPU executables are keyed by device_kind already.
    """
    if platform != "cpu":
        return ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform as _plat

    return _plat.machine() or "unknown-cpu"


def _key(lowered, devices) -> str:
    import jax

    platform = devices[0].platform
    fp = _host_fingerprint(platform)
    ident = "\x00".join([
        jax.__version__,
        platform,
        getattr(devices[0], "device_kind", "?"),
        # only present on cpu, so existing TPU cache entries stay valid
        *([fp] if fp else []),
        str(len(devices)),
        lowered.as_text(),
    ])
    return hashlib.sha256(ident.encode()).hexdigest()[:24]


def default_cache_dir() -> str:
    return os.environ.get(
        "ONDA_AOT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "onda_aot"),
    )


def warm(jitted, args, cache_dir: str | None = None, tag: str = "step",
         verbose: bool = True):
    """Return a ready `Compiled` for `jitted(*args)` — deserialized from the
    cache when possible, else compiled now and persisted. None on failure
    (caller keeps the plain jit path)."""
    import jax

    cache_dir = cache_dir or default_cache_dir()
    try:
        # XLA:CPU deserialized executables are only reliable in processes
        # that have not compiled unrelated programs first (symbol-registry
        # collisions → NOT_FOUND at execution; see tests/test_aot_cache.py),
        # and the train loop warms AFTER bootstrap/eval compiles. With
        # AOT_CACHE now default-on, cpu backends (the test environment) skip
        # the AOT path entirely unless opted in (ONDA_AOT_CPU_OK=1, set by
        # the fresh-process test harness) — the plain jit dispatch path keeps
        # the persistent HLO cache, which `lowered.compile()` here must
        # disable (see below), so opting cpu out is also the fast path.
        if (jax.devices()[0].platform == "cpu"
                and os.environ.get("ONDA_AOT_CPU_OK") != "1"):
            if verbose:
                print("# aot_cache: cpu backend without ONDA_AOT_CPU_OK=1 "
                      "— keeping the plain jit path")
            return None
        lowered = jitted.lower(*args)
        devices = list(jax.devices())
        key = _key(lowered, devices)
        path = os.path.join(cache_dir, f"aot_{tag}_{key}.pkl")
        if not os.path.exists(path):
            # the tag is COSMETIC — identity is the key alone, so an
            # executable serialized under another tag (bench vs train CLI:
            # byte-identical step programs) still hits
            import glob

            same_key = glob.glob(os.path.join(cache_dir, f"aot_*_{key}.pkl"))
            if same_key:
                path = same_key[0]
        if os.path.exists(path):
            from jax.experimental.serialize_executable import deserialize_and_load

            t0 = time.perf_counter()
            with open(path, "rb") as f:
                payload, in_tree, out_tree, device_ids = pickle.load(f)
            # rebind to the SAME device set the executable was compiled for —
            # the default would spread it over every local device (observed:
            # "expected 8 shards" on the 8-virtual-device CPU test mesh for a
            # single-device program)
            by_id = {d.id: d for d in devices}
            compiled = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=[by_id[i] for i in device_ids])
            if verbose:
                print(f"# aot_cache: loaded {os.path.basename(path)} "
                      f"in {time.perf_counter() - t0:.2f}s (no XLA compile)")
            return compiled
        from jax.experimental.serialize_executable import serialize

        # the persistent HLO compile cache must be OFF while compiling an
        # executable we intend to serialize: a cache-hit compile returns an
        # executable whose serialize() payload is incomplete — deserializing
        # it later fails at run time with NOT_FOUND "Function wrapped_add not
        # found" on XLA:CPU (measured on jax 0.9.0). Restored right after.
        hlo_cache = jax.config.jax_compilation_cache_dir
        if hlo_cache:
            jax.config.update("jax_compilation_cache_dir", None)
        t0 = time.perf_counter()
        try:
            compiled = lowered.compile()
        finally:
            if hlo_cache:
                jax.config.update("jax_compilation_cache_dir", hlo_cache)
        compile_s = time.perf_counter() - t0
        try:
            payload, in_tree, out_tree = serialize(compiled)
            shardings = jax.tree.leaves(compiled.input_shardings)
            device_ids = sorted({d.id for s in shardings for d in s.device_set}
                                or {devices[0].id})
            os.makedirs(cache_dir, exist_ok=True)
            tmp = path + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, device_ids), f)
            os.replace(tmp, path)  # atomic: concurrent warmers never see partials
            if verbose:
                print(f"# aot_cache: compiled in {compile_s:.1f}s, serialized "
                      f"{os.path.getsize(path) / 1e6:.1f} MB → {path}")
        except Exception as exc:  # serialization unsupported: still return compiled
            if verbose:
                print(f"# aot_cache: executable serialization unavailable "
                      f"({type(exc).__name__}: {exc}) — compiled without persisting")
        return compiled
    except Exception as exc:
        if verbose:
            print(f"# aot_cache: AOT path failed ({type(exc).__name__}: {exc}) "
                  "— falling back to jit dispatch")
        return None
