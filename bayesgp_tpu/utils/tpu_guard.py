"""TPU worker-health guardrails.

The reference's failure mode is an R `stop()` — never a dead session
(SURVEY.md §5: error handling is argument validation). On the axon
v5-lite tunnel, a faulting on-chip program historically did worse than
fail: it left the worker in a degraded state where even
previously-fine programs died with "worker crashed" until a trivial-op
probe cleared it (BENCH_NOTES round-13 addenda). The round-14 chunked
band kernels remove the known fault source (VMEM overflow of
whole-array band kernels), but the framework still needs to (a) turn
an unexpected worker fault into an actionable error instead of a
poisoned session, and (b) recover the worker so subsequent fits run.

Usage:
    from bayesgp_tpu.utils import tpu_guard
    healthy = tpu_guard.probe()          # one trivial-op round trip
    tpu_guard.recover()                  # probe/retry until healthy
    out = tpu_guard.run_guarded(fn, *a)  # recover + raise WorkerCrash
                                         # on a worker fault

bench_extra.py wraps every config in run_guarded so one faulting
config can no longer poison the rest of the sweep.
"""
from __future__ import annotations

import time


class WorkerCrash(RuntimeError):
    """An on-chip program faulted the TPU worker. The original error is
    chained; `recovered` says whether a post-crash probe succeeded (so
    subsequent programs can run)."""

    def __init__(self, msg, recovered: bool):
        super().__init__(msg)
        self.recovered = recovered


def _is_worker_fault(exc: BaseException) -> bool:
    txt = f"{type(exc).__name__}: {exc}".lower()
    return any(s in txt for s in (
        "worker crashed", "worker has crashed", "internal error",
        "unavailable", "tpu driver"))


def probe(device=None) -> bool:
    """One REAL device round trip (a dispatch + transfer — not just
    jax.devices(), which succeeds even when dispatches hang)."""
    import jax
    import jax.numpy as jnp
    try:
        x = jnp.arange(8.0, dtype=jnp.float32)
        if device is not None:
            x = jax.device_put(x, device)
        return float(jnp.sum(x).block_until_ready()) == 28.0
    except Exception:
        return False


def recover(max_tries: int = 6, sleep_s: float = 5.0) -> bool:
    """Probe/retry until the worker answers. A crashed v5-lite worker
    clears its degraded state after a few trivial-op round trips
    (measured round 13); returns False if it never does."""
    for i in range(max_tries):
        if probe():
            return True
        time.sleep(sleep_s * (1 + i))
    return False


def run_guarded(fn, *args, _recover: bool = True, **kwargs):
    """Run `fn`; on a worker-fault exception, optionally recover the
    worker, then raise WorkerCrash (chained) with a status line instead
    of leaving the session poisoned. Non-fault exceptions propagate
    unchanged."""
    try:
        return fn(*args, **kwargs)
    except Exception as e:                      # noqa: BLE001
        if not _is_worker_fault(e):
            raise
        ok = recover() if _recover else False
        raise WorkerCrash(
            f"TPU worker fault while running {getattr(fn, '__name__', fn)}"
            f" ({type(e).__name__}); worker "
            f"{'recovered — subsequent programs can run' if ok else 'did NOT recover'}.",
            recovered=ok) from e
