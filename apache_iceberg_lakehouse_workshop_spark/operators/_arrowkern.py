"""Zero-copy Arrow<->numpy bridges for the dense-linear-algebra kernels.

The ANN/dedup kernels (similarity.py) move ``array<bigint>`` vectors across
the JVM<->Python boundary.  The ``mapInPandas`` form pays a per-row Python
tax on BOTH sides of that boundary: Arrow->pandas materializes each list as
a boxed numpy object (then the kernel re-boxes with
``np.stack([np.asarray(x) for x in col])``), and pandas->Arrow re-walks
every emitted list element-by-element.  Measured at the s6/s7 tiers the
conversion costs ~4x the actual matmul (guide §4.2: hand whole batches to
vectorized native code; §4.1: you control *how efficiently* columns cross).

These helpers keep the crossing at C speed: a dense ``list<int64>`` column
is one contiguous values buffer plus offsets, so the (n, d) matrix the
kernels want is a ``flatten()`` + ``reshape`` view (no per-row work), and a
result matrix becomes a list column via one arithmetic offsets array over
its flat buffer.  Every helper is bit-identical to the per-row form it
replaces — same int64 values, same row order — with an explicit per-row
fallback for ragged/null layouts so correctness never depends on the fast
path engaging.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_col_matrix(col) -> np.ndarray:
    """``list<int64>`` Array/ChunkedArray -> (n, d) int64 matrix.

    Zero-copy when the column is dense (no nulls, uniform row width):
    ``flatten()`` yields the contiguous values slice and the matrix is a
    reshape view.  Ragged/null layouts (never produced by the engine's
    fixed-``dim`` vector columns, but contractually possible) fall back to
    the bit-identical per-row stack.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.int64)
    t = col.type
    if col.null_count == 0 and (pa.types.is_list(t) or pa.types.is_large_list(t)):
        lens = col.value_lengths().to_numpy(zero_copy_only=False)
        d = int(lens[0])
        if d > 0 and (lens == d).all():
            flat = col.flatten()
            if flat.null_count == 0:
                vals = flat.to_numpy(zero_copy_only=True)
                if vals.dtype == np.int64 and len(vals) == n * d:
                    return vals.reshape(n, d)
    return np.stack([np.asarray(x, dtype=np.int64) for x in col.to_pylist()])


def int_col(col) -> np.ndarray:
    """int64 Array/ChunkedArray -> 1-D numpy (zero-copy when null-free)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def matrix_list_array(M: np.ndarray) -> pa.ListArray:
    """(n, d) int64 matrix -> ``list<int64>`` ListArray over its flat
    buffer (one arithmetic offsets array; no per-row conversion)."""
    M = np.ascontiguousarray(M, dtype=np.int64)
    n, d = M.shape
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32), type=pa.int32())
    return pa.ListArray.from_arrays(offsets, pa.array(M.reshape(-1), type=pa.int64()))


def batch(names_arrays) -> pa.RecordBatch:
    """[(name, array-like)] -> RecordBatch.  numpy ints/floats pass through
    ``pa.array`` zero-copy; declared Spark ``int`` fields must be handed in
    as int32 (use :func:`i32`)."""
    return pa.RecordBatch.from_arrays(
        [a if isinstance(a, (pa.Array, pa.ChunkedArray)) else pa.array(a) for _, a in names_arrays],
        names=[n for n, _ in names_arrays],
    )


def i32(a) -> pa.Array:
    return pa.array(np.asarray(a, dtype=np.int32), type=pa.int32())


def i64(a) -> pa.Array:
    return pa.array(np.asarray(a, dtype=np.int64), type=pa.int64())


def f64(a) -> pa.Array:
    return pa.array(np.asarray(a, dtype=np.float64), type=pa.float64())
