"""Loader contracts: parquet streaming, numpy loader, lazy postgres gating."""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_tpu.io.numpy_io import iter_numpy_vectors
from lshrs_tpu.io.parquet import iter_parquet_vectors

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as pq  # noqa: E402


@pytest.fixture
def parquet_file(tmp_path, rng):
    n, dim = 25, 8
    vectors = rng.standard_normal((n, dim)).astype(np.float32)
    table = pa.table(
        {
            "index": pa.array(range(n), type=pa.int64()),
            "vector": pa.array([row.tolist() for row in vectors]),
        }
    )
    path = tmp_path / "vectors.parquet"
    pq.write_table(table, path)
    return path, vectors


def test_parquet_streaming_batches(parquet_file):
    path, vectors = parquet_file
    batches = list(iter_parquet_vectors(path, batch_size=10))
    assert [len(b[0]) for b in batches] == [10, 10, 5]
    all_ids = [i for b in batches for i in b[0]]
    assert all_ids == list(range(25))
    stacked = np.concatenate([b[1] for b in batches])
    np.testing.assert_allclose(stacked, vectors, rtol=1e-6)
    assert stacked.dtype == np.float32


def test_parquet_missing_file():
    with pytest.raises(FileNotFoundError):
        list(iter_parquet_vectors("/nonexistent/x.parquet"))


def test_parquet_missing_column(parquet_file):
    path, _ = parquet_file
    with pytest.raises(ValueError, match="Column 'embedding'"):
        list(iter_parquet_vectors(path, vector_column="embedding"))


def test_parquet_bad_batch_size(parquet_file):
    path, _ = parquet_file
    with pytest.raises(ValueError, match="batch_size"):
        list(iter_parquet_vectors(path, batch_size=0))


def test_parquet_create_signatures_end_to_end(parquet_file, make_device_lsh):
    path, vectors = parquet_file
    lsh = make_device_lsh(dim=8, num_bands=4, rows_per_band=8, num_perm=32)
    lsh.create_signatures(format="parquet", source=path, batch_size=7)
    assert lsh.stats()["index"]["alive"] == 25
    assert lsh.get_top_k(vectors[13], topk=1) == [13]


def test_numpy_loader_arrays(rng):
    X = rng.standard_normal((11, 4)).astype(np.float32)
    batches = list(iter_numpy_vectors(vectors=X, batch_size=4))
    assert [len(b[0]) for b in batches] == [4, 4, 3]
    assert batches[0][0] == [0, 1, 2, 3]


def test_numpy_loader_custom_indices_validation(rng):
    X = rng.standard_normal((5, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="does not match"):
        list(iter_numpy_vectors(vectors=X, indices=[1, 2]))


def test_numpy_loader_npz(tmp_path, rng):
    X = rng.standard_normal((9, 4)).astype(np.float32)
    ids = np.arange(100, 109)
    path = tmp_path / "data.npz"
    np.savez(path, vectors=X, indices=ids)
    batches = list(iter_numpy_vectors(path, batch_size=5))
    assert batches[0][0] == list(range(100, 105))
    np.testing.assert_allclose(np.concatenate([b[1] for b in batches]), X)


def test_postgres_requires_connection_info():
    psycopg = pytest.importorskip("psycopg")  # noqa: F841
    from lshrs_tpu.io.postgres import iter_postgres_vectors

    with pytest.raises(ValueError, match="dsn"):
        list(iter_postgres_vectors())


def test_postgres_coerce_vector_formats():
    from lshrs_tpu.io.postgres import _coerce_vector

    raw = np.array([1.5, -2.0, 3.25], np.float32)
    np.testing.assert_array_equal(_coerce_vector(raw.tobytes()), raw)
    np.testing.assert_array_equal(_coerce_vector(memoryview(raw.tobytes())), raw)
    np.testing.assert_array_equal(_coerce_vector("{1.5,-2.0,3.25}"), raw)
    np.testing.assert_array_equal(_coerce_vector("[1.5,-2.0,3.25]"), raw)
    np.testing.assert_array_equal(_coerce_vector([1.5, -2.0, 3.25]), raw)
    with pytest.raises(ValueError, match="empty"):
        _coerce_vector("{}")
