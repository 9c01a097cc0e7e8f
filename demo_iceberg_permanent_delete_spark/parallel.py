"""Driver-side overlap of independent Spark jobs (optimization guide
§2.6): Spark's scheduler happily runs several jobs at once inside one
application — actions are only sequential because driver code calls them
sequentially. Composite operators that build INDEPENDENT artifacts (two
tables in separate warehouses, two bounded streams, disjoint feeds of one
union) submit them from a small thread pool so one job's straggler tail
back-fills executors the other has freed, instead of leaving the cluster
idle between phases.

Only for genuinely independent work: the thunks must not touch the same
table/metadata document, temp view, or session conf (the lake write path's
one shared conf override is refcount-guarded in ``lake/datafiles.py``
exactly so that concurrent writers are safe).
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark import inheritable_thread_target


def run_concurrent(*thunks: Callable[[], Any]) -> list[Any]:
    """Run the thunks concurrently in driver threads; return their results
    in input order. Exceptions propagate (the first failing thunk's error,
    after every thunk has settled — results must never outlive a sibling
    still holding shared fixtures).

    ``inheritable_thread_target`` is the documented PySpark way to run
    driver threads so JVM thread-local properties (job group/description)
    are inherited and cleaned up; 2-3 jobs in flight is the sweet spot —
    enough to fill the tail, not so many that they fight for executors."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(inheritable_thread_target(t)) for t in thunks]
        # settle all before raising: a fast-failing sibling must not tear
        # down fixtures (temp dirs, views) a still-running thunk reads
        done = [f.exception() for f in futures]
        for err in done:
            if err is not None:
                raise err
        return [f.result() for f in futures]
