"""Executor-side importability.

The correctness driver imports this package from an arbitrary cwd via a
sys.path edit — which does NOT propagate to executor Python workers, so any
pandas UDF / mapInPandas function defined here would die with
ModuleNotFoundError when unpickled on a worker. Modules that ship code to
executors register themselves for cloudpickle BY-VALUE serialization: the
function bodies (and their module globals) travel inside the pickle, and
workers never import the package at all.
"""

from __future__ import annotations

import sys


def register_module_by_value(name: str) -> None:
    try:
        from pyspark import cloudpickle
    except Exception:  # pragma: no cover
        import cloudpickle  # type: ignore[no-redef]
    mod = sys.modules.get(name)
    if mod is None:
        return
    try:
        cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass
