"""On-disk compiled-executable cache for lifted fused programs.

The persistent XLA compile cache (.jax_cache) removes only the XLA
compile step; a fresh process still pays trace + lower + load per
program — measured ~36 s/call at lynx scale and ~50 s at headline
scale through the tunnel (BENCH_NOTES rounds 13-14). The reference's
everyday UX is a seconds-scale R fit per fresh session
(/root/reference/vignettes/BayesGP-sGP.Rmd:72-108), so fresh-process
latency is a first-class parity target, not a nicety.

This layer serializes the COMPILED executable
(jax.experimental.serialize_executable) keyed by the backend content
signature + program key + argument avals + jax version + platform.
A fresh process with an identical model deserializes and loads the
executable outright: no trace, no lower, no XLA compile.

Safety: every disk interaction fails SOFT (any exception falls back to
the normal jit path) — a stale cache from an older jax/plugin version
must never break a fit. Writes are atomic (temp file + rename).

Disable with BAYESGP_PROG_CACHE=0; relocate with
BAYESGP_PROG_CACHE_DIR.
"""
import os
import pickle
import hashlib
import tempfile

import jax

_DEF_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                        ".prog_cache")

# process-lifetime counters (tests + diagnostics)
stats = {"disk_hits": 0, "stores": 0, "misses": 0}


def cache_dir():
    d = os.environ.get("BAYESGP_PROG_CACHE_DIR", _DEF_DIR)
    return os.path.abspath(d)


def enabled():
    return os.environ.get("BAYESGP_PROG_CACHE", "1") != "0"


def usable():
    """The executable cache serves the SINGLE-DEVICE accelerator case
    (the 1-chip tunnel) — that's where trace+lower+load costs ~36 s per
    program. It must stay inert (a) under a forced multi-device host
    mesh (8 virtual CPU devices in tests: lowered executables pick up
    device-assignment baggage that breaks round-tripping) and (b) on
    the CPU backend entirely: XLA:CPU AOT results bake in compile-host
    machine features and SEGFAULT when the loading host differs
    (measured SIGSEGV on this fleet). BAYESGP_PROG_CACHE=force
    overrides the CPU gate for controlled experiments only."""
    if not enabled():
        return False
    try:
        if len(jax.devices()) != 1:
            return False
        if jax.default_backend() == "cpu":
            return os.environ.get("BAYESGP_PROG_CACHE") == "force"
        return True
    except Exception:
        return False


def max_bytes():
    """Serialized-executable size cap (default 64 MB). The disk cache
    targets SMALL-model fresh-process latency (trace+lower+load ~36 s
    at lynx scale); headline-scale executables serialize to ~445 MB
    (measured round 15) — reloading that through the tunnel is no
    faster than the trace+lower it would save, and it fills the disk."""
    return int(os.environ.get("BAYESGP_PROG_CACHE_MAX_MB", "64")) * 2**20


def _avals_key(args):
    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for x in leaves:
        parts.append(f"{jax.numpy.shape(x)}:{jax.numpy.result_type(x)}")
    return "|".join(parts)


def _key(sig, prog_key, args):
    h = hashlib.sha256()
    h.update(str(sig).encode())
    h.update(repr(prog_key).encode())
    h.update(_avals_key(args).encode())
    h.update(jax.__version__.encode())
    h.update(jax.default_backend().encode())
    try:
        h.update(jax.devices()[0].device_kind.encode())
    except Exception:
        pass
    return h.hexdigest()


def load(sig, prog_key, args):
    """Deserialized executable for (sig, prog_key, avals) or None."""
    if not enabled():
        return None
    path = os.path.join(cache_dir(), _key(sig, prog_key, args) + ".jexe")
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        exe = se.deserialize_and_load(payload, in_tree, out_tree)
        stats["disk_hits"] += 1
        return exe
    except Exception:
        try:
            os.remove(path)        # poisoned entry: drop it
        except OSError:
            pass
        return None


def _debug(msg):
    if os.environ.get("BAYESGP_PROG_CACHE_DEBUG"):
        import sys
        print(f"# prog_cache: {msg}", file=sys.stderr, flush=True)


def store(sig, prog_key, args, compiled):
    """True iff the executable was serialized to disk (False routes
    the caller to the jax.export layer instead)."""
    if not enabled():
        return False
    try:
        from jax.experimental import serialize_executable as se
        blob = pickle.dumps(se.serialize(compiled))
        if len(blob) > max_bytes():
            _debug(f"store skipped: {len(blob)/2**20:.0f} MB > cap")
            return False
        d = cache_dir()
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, _key(sig, prog_key, args) + ".jexe")
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        stats["stores"] += 1
        return True
    except Exception as e:                      # noqa: BLE001
        _debug(f"store failed: {type(e).__name__}: {e}")
        return False


def _export_disabled_checks():
    from jax import export as jexport
    # Pallas kernels lower to tpu_custom_call, which is not on the
    # jax.export stability allowlist — fine here: the cache key pins
    # jax version + platform, so there is no cross-version contract
    return [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
            jexport.DisabledSafetyCheck.custom_call(
                "mosaic_tpu_custom_call")]


def load_export(sig, prog_key, args):
    """jax.export-layer hit: a callable that skips TRACE + LOWER (the
    serialized StableHLO feeds XLA directly; the persistent compile
    cache serves the compile). Returns None on miss/any failure."""
    if not enabled():
        return None
    path = os.path.join(cache_dir(), _key(sig, prog_key, args) + ".jexp")
    if not os.path.exists(path):
        return None
    try:
        import jax as _jax
        from jax import export as jexport
        with open(path, "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        stats["disk_hits"] += 1
        return _jax.jit(exp.call)
    except Exception as e:                      # noqa: BLE001
        _debug(f"export load failed: {type(e).__name__}: {e}")
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def store_export(jfn, sig, prog_key, args):
    """Serialize the traced/lowered function (jax.export). ~StableHLO
    size (MBs after constant lifting) — the layer that serves programs
    whose compiled executables exceed the size cap (445-559 MB at
    lynx/headline scale: reloading those through the tunnel measured
    SLOWER than the trace+lower they replace, BENCH_NOTES round 15)."""
    if not enabled():
        return
    try:
        from jax import export as jexport
        exp = jexport.export(
            jfn, disabled_checks=_export_disabled_checks())(*args)
        blob = exp.serialize()
        if len(blob) > max_bytes():
            _debug(f"export store skipped: {len(blob)/2**20:.0f} MB")
            return
        d = cache_dir()
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, _key(sig, prog_key, args) + ".jexp")
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(bytes(blob))
        os.replace(tmp, path)
        stats["stores"] += 1
    except Exception as e:                      # noqa: BLE001
        _debug(f"export store failed: {type(e).__name__}: {e}")


def get_or_compile(jfn, sig, prog_key, args):
    """Executable for jfn at `args`: exe disk hit, else export-layer
    hit (skips trace+lower, compile served by the persistent cache),
    else lower+compile+store. Small executables serialize whole; big
    ones store the jax.export artifact instead. Returns (callable,
    'disk'|'export'|'compiled'). Falls back to the plain jitted
    callable on ANY serialization failure."""
    if not usable():
        return jfn, "jit"
    exe = load(sig, prog_key, args)
    if exe is not None:
        return exe, "disk"
    expfn = load_export(sig, prog_key, args)
    if expfn is not None:
        return expfn, "export"
    stats["misses"] += 1
    try:
        exe = jfn.lower(*args).compile()
    except Exception as e:                      # noqa: BLE001
        _debug(f"lower/compile failed: {type(e).__name__}: {e}")
        return jfn, "jit"          # lowering path quirk: plain jit
    if not store(sig, prog_key, args, exe):
        store_export(jfn, sig, prog_key, args)
    return exe, "compiled"
