"""Cross-process AOT warm start for the jitted render steps.

The reference renderer restarts instantly because its "compile" is a C++
build done once (reference src/pathtracer/raytraced_renderer.cpp:267-328
just re-tiles and re-launches threads).  Our BDPT step is a single large
XLA program whose cold Mosaic compile costs 100-320 s per scene shape on
the remote chip (BENCH_NOTES.md compile table), and JAX's persistent
compilation cache only skips the XLA compile — every new process still
pays Python tracing + MLIR lowering (~10 s small scenes, much more at
480x360) plus the cache lookup.

This module persists the COMPILED PJRT EXECUTABLE itself
(jax.experimental.serialize_executable): the first process lowers,
compiles, and serializes; later processes deserialize_and_load in a few
seconds and skip tracing, lowering, and compilation entirely.  Measured
r04 on the small CBspheres_lambertian step: 24.4 s (lower 9.3 + compile
15.1) -> 2.7 s load + 0.9 s first dispatch.

Keys cover everything that can change the program: jax version, backend +
device kind + device count, a digest of the package's .py sources (kernel
edits invalidate), the BDPT_TPU_* env knobs baked into the kernels at
import (TILE_R, SUBTILES, sort modes, RNG impl, cluster layout/build),
the traced config repr, static dims, and every dynamic operand's
shape/dtype.  Entries live in BDPT_TPU_AOT_DIR (default: a 0700
user-owned dir under $XDG_CACHE_HOME or ~/.cache — executables are
unpickled, so the directory must not be attacker-writable).  Set
BDPT_TPU_AOT=0 to disable; any load/compile error falls back to the
plain jit path.
"""

from __future__ import annotations

import glob
import hashlib
import logging
import os
import pickle

import jax

log = logging.getLogger(__name__)


def _default_aot_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "bdpt_aot")


AOT_DIR = os.environ.get("BDPT_TPU_AOT_DIR", _default_aot_dir())
ENABLED = os.environ.get("BDPT_TPU_AOT", "1") != "0"

# env knobs that change the compiled program without changing operand
# shapes or the traced config — they must key the executable (an A/B
# sweep run with different knob values would otherwise silently load an
# executable compiled under the other setting)
_KNOB_VARS = ("BDPT_TPU_TILE_R", "BDPT_TPU_SUBTILES", "BDPT_TPU_SORT",
              "BDPT_TPU_WALK_SORT", "BDPT_TPU_SUBCLUSTERS",
              "BDPT_TPU_CLUSTER_BUILD", "BDPT_TPU_RNG",
              "BDPT_TPU_ENV_STRATEGY")


def _knob_desc() -> str:
    return ";".join(f"{k}={os.environ.get(k, '')}" for k in _KNOB_VARS)

_src_digest_cache = None
_loaded = {}   # key -> compiled executable (per-process memo)


def _source_digest() -> str:
    """Content hash of the package sources — a kernel/integrator edit must
    invalidate persisted executables."""
    global _src_digest_cache
    if _src_digest_cache is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for p in sorted(glob.glob(os.path.join(pkg, "**", "*.py"),
                                  recursive=True)):
            h.update(p.encode())
            with open(p, "rb") as f:
                h.update(f.read())
        _src_digest_cache = h.hexdigest()[:16]
    return _src_digest_cache


def _abstractify(tree):
    return jax.tree_util.tree_map(
        lambda a: (getattr(a, "shape", None), str(getattr(a, "dtype", type(a)))),
        tree)


def step_key(fn_name: str, dynamic_args, static_desc: str) -> str:
    back = jax.default_backend()
    devs = jax.devices()
    parts = [jax.__version__, back, devs[0].device_kind, str(len(devs)),
             _source_digest(), _knob_desc(), fn_name, static_desc,
             repr(_abstractify(dynamic_args))]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:32]


def usable() -> bool:
    """AOT persistence is for the real-chip path; virtual-CPU test meshes
    churn shapes and gain nothing from 50 MB disk entries."""
    return ENABLED and jax.default_backend() in ("tpu", "axon")


def get_step(jitted_fn, fn_name: str, example_args, n_static_prefix_after):
    """Resolve a compiled step for `jitted_fn` called as
    jitted_fn(*example_args).

    example_args: the FULL argument list (including statics, matching the
    jit wrapper's signature).  n_static_prefix_after: (slice of dynamic
    positions, static descriptor string) — callers pass which positions
    are dynamic and a stable repr of the static ones.

    Returns (call, loaded_from_disk): `call(*dynamic_args)` runs the
    compiled executable.  Falls back to the jit wrapper on any error.
    """
    dyn_idx, static_desc = n_static_prefix_after
    dynamic_args = [example_args[i] for i in dyn_idx]

    def jit_call(*dyn):
        full = list(example_args)
        for i, v in zip(dyn_idx, dyn):
            full[i] = v
        return jitted_fn(*full)

    if not usable():
        return jit_call, False

    key = step_key(fn_name, dynamic_args, static_desc)
    path = os.path.join(AOT_DIR, f"{fn_name}-{key}.pkl")

    if key in _loaded:
        return _loaded[key], True

    if os.path.exists(path):
        try:
            # unpickling executes arbitrary code: refuse entries planted
            # by another uid (the dir default is 0700, but AOT_DIR is
            # user-overridable to shared locations)
            if os.stat(path).st_uid != os.getuid():
                raise PermissionError(f"{path} not owned by uid "
                                      f"{os.getuid()}; refusing to unpickle")
            from jax.experimental import serialize_executable as se
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = se.deserialize_and_load(payload, in_tree, out_tree)
            _loaded[key] = compiled
            log.info("AOT warm start: loaded %s", path)
            return compiled, True
        except Exception as e:  # stale jaxlib / topology change: recompile
            log.warning("AOT load failed (%s); recompiling", e)
            try:
                os.remove(path)
            except OSError:
                pass

    try:
        lowered = jitted_fn.lower(*example_args)
        compiled = lowered.compile()
        _loaded[key] = compiled
        try:
            from jax.experimental import serialize_executable as se
            payload, in_tree, out_tree = se.serialize(compiled)
            os.makedirs(AOT_DIR, mode=0o700, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
            log.info("AOT warm start: wrote %s (%d MB)", path,
                     len(payload) >> 20)
        except Exception as e:
            log.warning("AOT serialize failed (%s); continuing uncached", e)
        return compiled, False
    except Exception as e:
        log.warning("AOT lower/compile failed (%s); plain jit path", e)
        return jit_call, False
