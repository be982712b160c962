"""Race-safe polars import for Ray workers.

polars' ``__init__`` binds its public classes late, and the internal
``polars._reexport`` module is itself populated by a chain of imports.
Inside a Ray worker two threads can trigger the first polars import
concurrently (the UDF thread and e.g. the stats/metrics thread); the
loser then observes a half-initialized module and calls like
``pl.from_arrow`` die with ``AttributeError: module 'polars._reexport'
has no attribute 'Series'`` (seen once per ~10^3 worker starts on the
bench host). CPython's import lock protects each module's *own* init,
but a partially-bound parent package is legitimately visible to other
threads mid-import, so the only safe pattern is: import, then verify
the attributes we rely on are bound, spinning briefly if not.

Every in-package ``import polars`` routes through :func:`import_polars`.
"""

from __future__ import annotations

import time


def import_polars():
    """Return the ``polars`` module, waiting (max ~10 s) until its public
    surface — and the lazily-bound ``_reexport`` mirror used internally by
    ``from_arrow``/``wrap_s`` — is fully initialized."""
    import polars as pl

    for _ in range(200):
        try:
            # the attributes the repo's kernels touch, plus the internal
            # mirror that wrap_s resolves at call time
            pl.Series, pl.DataFrame, pl.from_arrow  # noqa: B018
            from polars import _reexport as _rx

            _rx.Series, _rx.DataFrame  # noqa: B018
            return pl
        except AttributeError:
            time.sleep(0.05)
    return pl
