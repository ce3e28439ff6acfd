"""pyarrow-native decode/encode helpers for ``mapInArrow`` kernels.

Why this module exists (optimization guide §4.2): an Arrow list
column stores its values as ONE contiguous buffer plus an offsets
array, so the dense ``(n, dim)`` matrix a vector kernel wants is a
zero-copy flatten + reshape. The ``mapInPandas`` idiom these kernels
previously used —

    np.stack([np.asarray(v, dtype=np.float64) for v in pdf[col]])

— pays a Python-interpreter round trip per CELL (~4-8 µs each, plus
the Arrow→pandas object-cell conversion itself): measured r13 on this
host, 8.6 s for 1M×64 vectors against 0.6 ms for the flatten form —
and the cost is per ROW, so it taxes a 100 TB corpus identically.
Everything here is exact float64/int64 buffer reinterpretation: the
kernels' arithmetic (and therefore every oracle hash) is unchanged.

Decode helpers take a ``pa.Array``/``ChunkedArray`` straight off a
``RecordBatch``; encode helpers build the list columns a kernel
yields back. Null list CELLS are not expected in kernel inputs (the
operators filter null text/vectors upstream); decoders assert so a
schema drift fails loudly instead of mis-reshaping.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _plain(arr):
    """ChunkedArray → single contiguous Array."""
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def fixed_matrix(arr, dtype=np.float64) -> np.ndarray:
    """list<numeric> column with UNIFORM row length → ``(n, dim)``
    ndarray. Zero-copy up to the dtype cast; raises on nulls or
    ragged rows (a vector column never has either)."""
    a = _plain(arr)
    n = len(a)
    if a.null_count:
        raise ValueError("fixed_matrix: null list cells in vector column")
    flat = np.asarray(a.flatten(), dtype=dtype)
    if n == 0:
        return flat.reshape(0, 0)
    dim, rem = divmod(flat.size, n)
    if rem:
        raise ValueError(
            f"fixed_matrix: ragged list column ({flat.size} values / {n} rows)"
        )
    return flat.reshape(n, dim)


def flat_with_lengths(arr, dtype=None):
    """Variable-length list column → ``(flat_values, lengths)`` with
    null cells counted as length 0 (matching how the kernels treated
    None cells). ``flat_values`` is a numpy array when ``dtype`` is
    given, else the flattened pyarrow Array (useful for strings)."""
    import pyarrow.compute as pc

    a = _plain(arr)
    lengths = pc.list_value_length(a).fill_null(0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = a.flatten()
    if dtype is not None:
        flat = np.asarray(flat, dtype=dtype)
    return flat, lengths


def flat_bytes(arr):
    """binary column → ``(values: uint8 ndarray, lengths: int64
    ndarray)`` where ``values`` is the concatenation of every cell's
    bytes (the column's own contiguous data buffer, zero-copy).
    Null cells count as length 0, matching ``bytes(None)``-guarded
    kernels that skip them."""
    a = _plain(arr)
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    bufs = a.buffers()  # [validity, offsets(int32), data(uint8)]
    offs = np.frombuffer(
        bufs[1], dtype=np.int32, count=n + 1 + a.offset
    )[a.offset:].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lengths = offs[1:] - offs[:-1]
    return data[offs[0]:offs[-1]], lengths


def i64(arr) -> np.ndarray:
    return np.asarray(_plain(arr), dtype=np.int64)


def f64(arr) -> np.ndarray:
    return np.asarray(_plain(arr), dtype=np.float64)


def list_f64(mat: np.ndarray) -> pa.ListArray:
    """(n, dim) ndarray → list<double> column (one values buffer)."""
    n, dim = mat.shape
    offsets = pa.array(
        np.arange(0, (n + 1) * dim, dim, dtype=np.int32), type=pa.int32()
    )
    return pa.ListArray.from_arrays(
        offsets, pa.array(np.ascontiguousarray(mat).reshape(-1),
                          type=pa.float64())
    )


def list_i64(mat: np.ndarray) -> pa.ListArray:
    """(n, dim) ndarray → list<long> column (one values buffer)."""
    n, dim = mat.shape
    offsets = pa.array(
        np.arange(0, (n + 1) * dim, dim, dtype=np.int32), type=pa.int32()
    )
    return pa.ListArray.from_arrays(
        offsets, pa.array(np.ascontiguousarray(mat).reshape(-1),
                          type=pa.int64())
    )


def list_i32(mat: np.ndarray) -> pa.ListArray:
    """(n, dim) ndarray → list<int> column (one values buffer)."""
    n, dim = mat.shape
    offsets = pa.array(
        np.arange(0, (n + 1) * dim, dim, dtype=np.int32), type=pa.int32()
    )
    return pa.ListArray.from_arrays(
        offsets, pa.array(np.ascontiguousarray(mat).reshape(-1),
                          type=pa.int32())
    )


def batch(**cols) -> pa.RecordBatch:
    """RecordBatch from name → (numpy array | pa.Array) pairs, with
    numpy ints/floats mapped to the Spark-schema arrow types the
    caller declared (int64/int32/float64 pass through)."""
    arrays, names = [], []
    for name, v in cols.items():
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            arrays.append(v)
        else:
            arrays.append(pa.array(v))
        names.append(name)
    return pa.RecordBatch.from_arrays(arrays, names)
