"""Host-side thread-pool map for IO fan-out (h5 dumps, renders).

Parity target: ``/root/reference/src/parallel/parallel.py:5-16`` (a joblib
thread map).  Device-side parallelism lives in ``parallel/mesh.py``.
"""

from __future__ import annotations


def parallel(fn, n_jobs, *args):
    from joblib import Parallel, delayed

    return Parallel(n_jobs=n_jobs if n_jobs != 0 else 1, prefer="threads")(
        delayed(fn)(*fn_args) for fn_args in zip(*args))


def get_parallel_list(x_list, n):
    sublist = []
    for i, x in enumerate(x_list):
        sublist.append(x)
        if (i + 1) % n == 0:
            yield sublist
            sublist = []
    if sublist:
        yield sublist


def get_tensor_items(x):
    """List-of-scalars coercion used when fanning tensor batches out to
    per-item host jobs (reference parallel.py:16)."""
    if x is None:
        return None
    out = []
    for item in x:
        out.append(item.item() if hasattr(item, "item") else item)
    return out
