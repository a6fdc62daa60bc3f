"""Make the READ-ONLY reference tsflex (at /root/reference, v0.4.1)
importable in this container for direct parity testing.

The reference is pure pandas/numpy but imports three packages this
container doesn't ship; none is exercised by parity tests:

- ``dill``          — only used by FeatureCollection.serialize()/
                      SeriesPipeline.serialize(); shimmed to cloudpickle
                      (same pickle-protocol surface for dump/load).
- ``multiprocess``  — the n_jobs>1 pool; parity tests run n_jobs=1, so
                      stdlib multiprocessing satisfies the import.
- ``tqdm``          — progress bars (show_progress=False paths only need
                      the symbol); shimmed to an identity passthrough.

Shims are only installed for module names that are genuinely absent, so
a lib-enabled environment uses the real packages untouched.
"""

import sys
import types


def install_reference():
    """Idempotently shim missing deps and put /root/reference on the
    path. Returns the imported ``tsflex`` module, or None when the
    reference checkout is unavailable (tests should skip)."""
    try:
        import cloudpickle
    except ImportError:  # pragma: no cover
        return None

    if "dill" not in sys.modules:
        try:
            import dill  # noqa: F401
        except ImportError:
            dill = types.ModuleType("dill")
            dill.dump = lambda obj, f, recurse=False: cloudpickle.dump(obj, f)
            dill.dumps = lambda obj, recurse=False: cloudpickle.dumps(obj)
            dill.load = lambda f: cloudpickle.load(f)
            dill.loads = lambda b: cloudpickle.loads(b)
            sys.modules["dill"] = dill

    if "multiprocess" not in sys.modules:
        try:
            import multiprocess  # noqa: F401
        except ImportError:
            import multiprocessing

            sys.modules["multiprocess"] = multiprocessing

    if "tqdm" not in sys.modules:
        try:
            import tqdm  # noqa: F401
        except ImportError:
            tqdm_mod = types.ModuleType("tqdm")
            tqdm_auto = types.ModuleType("tqdm.auto")

            def _tqdm(it=None, *a, **k):
                return it

            tqdm_mod.tqdm = _tqdm
            tqdm_auto.tqdm = _tqdm
            sys.modules["tqdm"] = tqdm_mod
            sys.modules["tqdm.auto"] = tqdm_auto

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import tsflex

        return tsflex
    except Exception:
        return None
