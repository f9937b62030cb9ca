"""Profiling / tracing helpers (SURVEY §5: the reference ships none — dask
task-name patching was its only observability; here the JAX profiler is the
native tool and these wrappers make it one line).

``trace`` captures a TensorBoard-loadable device trace; ``timed`` measures a
jitted callable through a scalar fetch — ``block_until_ready`` is not a
reliable sync point through remote-device relays (docs/PERFORMANCE.md), so
wall-clock is taken around a forced host transfer of a summary scalar.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["timed", "trace"]


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Capture a JAX profiler trace into ``logdir`` (TensorBoard format).

    >>> with trace("/tmp/xsdba-trace"):
    ...     scen = eqm.adjust(sim)
    """
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 3, warmup: int = 1, **kwargs):
    """Best-of-``reps`` wall time of ``fn(*args, **kwargs)``, synchronized by
    fetching a summary scalar of the output (works through device relays
    where ``block_until_ready`` returns early).

    Returns ``(best_seconds, last_output)``.
    """
    import jax.numpy as jnp
    import numpy as np

    def _sync(out):
        leaves = [x for x in _leaves(out) if hasattr(x, "dtype")]
        if leaves:
            float(jnp.nansum(jnp.asarray(leaves[0]).ravel()[:1]))
        return out

    def _leaves(out):
        import jax

        return jax.tree_util.tree_leaves(out)

    out = None
    for _ in range(max(warmup, 0)):
        out = _sync(fn(*args, **kwargs))
    best = np.inf
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        out = _sync(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best, out
