"""Masked batch application for embedding-column pandas UDFs.

One vectorized kernel call over the dim-conforming rows of an Arrow
batch, with None scattered back at the bad positions. A sparsely
corrupt corpus (one truncated vector per 10k-row batch) must neither
kill the stage NOR degrade the whole batch to per-row Python — the
matmul still runs once per batch over the good rows.
"""

import numpy as np


def apply_masked(lst, dim: int, kernel):
    """``lst``: list of vectors (list|None); ``kernel``: (n, dim)
    float64 matrix → length-n sequence of per-row results. Returns a
    length-len(lst) list with None at non-conforming positions."""
    out = [None] * len(lst)
    good, rows = [], []
    for i, v in enumerate(lst):
        if v is not None and len(v) == dim:
            good.append(i)
            rows.append(v)
    if not good:
        return out
    try:
        m = np.array(rows, dtype=np.float64)
    except (ValueError, TypeError):
        # right-length but non-numeric rows — drop those per-row (rare)
        good2, mats = [], []
        for i, v in zip(good, rows):
            try:
                mats.append(np.asarray(v, dtype=np.float64))
                good2.append(i)
            except (ValueError, TypeError):
                pass
        if not good2:
            return out
        m, good = np.stack(mats), good2
    res = kernel(m)
    for j, i in enumerate(good):
        out[i] = res[j]
    return out
