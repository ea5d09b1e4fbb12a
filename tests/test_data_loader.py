"""Native + numpy data loaders (brevitas_tpu/data.py, csrc/data_loader.cc)."""

import numpy as np
import pytest

from brevitas_tpu.data import NativeDataLoader, NumpyDataLoader, make_loader


def _dataset(n=256, row=12, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, row)).astype(np.float32)
    y = rng.integers(0, 10, n).astype(np.int32)
    return x, y


@pytest.mark.parametrize("cls", [NativeDataLoader, NumpyDataLoader])
def test_one_epoch_is_a_permutation(cls):
    x, y = _dataset()
    # encode the row id in feature 0 so we can recover the permutation
    x[:, 0] = np.arange(len(x))
    ld = cls(x, y, batch_size=32, seed=1, shuffle=True)
    seen_rows, seen_labels = [], []
    for xb, yb in ld:
        if ld.epoch > 0:
            break
        seen_rows.extend(xb[:, 0].astype(int).tolist())
        seen_labels.extend(yb.tolist())
    ld.close()
    assert sorted(seen_rows) == list(range(256))
    assert sorted(seen_labels) == sorted(y.tolist())
    assert seen_rows != list(range(256))  # actually shuffled


@pytest.mark.parametrize("cls", [NativeDataLoader, NumpyDataLoader])
def test_gather_content_matches_source(cls):
    x, y = _dataset(n=64, row=8)
    x[:, 0] = np.arange(64)
    ld = cls(x, y, batch_size=16, seed=3, shuffle=True)
    for _ in range(7):  # crosses an epoch boundary
        xb, yb = next(ld)
        rows = xb[:, 0].astype(int)
        np.testing.assert_allclose(xb, x[rows], rtol=0, atol=0)
        np.testing.assert_array_equal(yb, y[rows])
    ld.close()


def test_native_deterministic_in_seed():
    x, y = _dataset(n=128, row=4)

    def first_epoch(seed):
        ld = NativeDataLoader(x, y, batch_size=32, seed=seed, num_threads=1)
        out = []
        for xb, yb in ld:
            if ld.epoch > 0:
                break
            out.append(yb.copy())
        ld.close()
        return np.concatenate(out)

    a, b = first_epoch(7), first_epoch(7)
    # single-threaded: identical batch order
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, first_epoch(8))


@pytest.mark.parametrize("cls", [NativeDataLoader, NumpyDataLoader])
def test_u8_normalization_fused(cls):
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (40, 6)).astype(np.uint8)
    ld = cls(x, None, batch_size=40, shuffle=False, seed=0,
             mean=0.1307, std=0.3081)
    xb, yb = next(ld)
    assert yb is None
    np.testing.assert_allclose(
        xb, (x.astype(np.float32) / 255.0 - 0.1307) / 0.3081, rtol=1e-5)
    ld.close()


def test_no_shuffle_is_sequential():
    x, y = _dataset(n=96, row=4)
    ld = NativeDataLoader(x, y, batch_size=32, shuffle=False, num_threads=1)
    got = [next(ld)[1].copy() for _ in range(3)]
    ld.close()
    np.testing.assert_array_equal(np.concatenate(got), y[:96])


def test_multithreaded_epoch_integrity():
    """4 worker threads racing across epoch boundaries still produce exact
    per-epoch permutations (the index snapshot under the lock)."""
    x, y = _dataset(n=512, row=4)
    x[:, 0] = np.arange(512)
    ld = NativeDataLoader(x, y, batch_size=64, seed=2, num_threads=4,
                          num_buffers=6)
    per_epoch = {}
    while True:
        xb, _ = next(ld)
        if ld.epoch >= 3:
            break
        per_epoch.setdefault(ld.epoch, []).extend(
            xb[:, 0].astype(int).tolist())
    ld.close()
    for ep in (0, 1, 2):
        assert sorted(per_epoch[ep]) == list(range(512)), f"epoch {ep}"


def test_make_loader_fallback(monkeypatch):
    x, y = _dataset(n=32, row=4)
    monkeypatch.setenv("BREVITAS_TPU_NATIVE_LOADER", "0")
    ld = make_loader(x, y, batch_size=8)
    assert isinstance(ld, NumpyDataLoader)
    monkeypatch.setenv("BREVITAS_TPU_NATIVE_LOADER", "1")
    ld2 = make_loader(x, y, batch_size=8)
    assert isinstance(ld2, NativeDataLoader)
    ld2.close()


# ---------------------------------------------------------------------------
# real-dataset file formats (bnn_pynq example loaders) on synthetic fixtures
# ---------------------------------------------------------------------------


def _write_idx(path, array):
    """Write a numpy uint8 array in IDX format (the MNIST wire format)."""
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, array.ndim))
        f.write(struct.pack(f">{array.ndim}I", *array.shape))
        f.write(array.astype(np.uint8).tobytes())


def test_load_mnist_idx_mixed_raw_gzip_split(tmp_path):
    """load_mnist parses real IDX files (both splits, raw train + gzip test
    in the same directory) and raises on a missing directory. Was shadowed
    by the later parametrized roundtrip test until round 4 (F811)."""
    import gzip

    from brevitas_tpu.examples.bnn_pynq import load_mnist

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (16, 28, 28)).astype(np.uint8)
    lbls = rng.integers(0, 10, 16).astype(np.uint8)
    _write_idx(tmp_path / "train-images-idx3-ubyte", imgs)
    _write_idx(tmp_path / "train-labels-idx1-ubyte", lbls)
    x, y = load_mnist(str(tmp_path), "train")
    assert x.shape == (16, 28, 28, 1) and x.dtype == np.float32
    np.testing.assert_allclose(x[..., 0], imgs / 255.0)
    np.testing.assert_array_equal(y, lbls.astype(np.int32))

    # test split, gzipped flavor
    _write_idx(tmp_path / "t10k-images-idx3-ubyte", imgs[:4])
    _write_idx(tmp_path / "t10k-labels-idx1-ubyte", lbls[:4])
    for name in ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"):
        with open(tmp_path / name, "rb") as f:
            data = f.read()
        with gzip.open(tmp_path / (name + ".gz"), "wb") as f:
            f.write(data)
        (tmp_path / name).unlink()
    x2, y2 = load_mnist(str(tmp_path), "test")
    assert x2.shape == (4, 28, 28, 1)
    np.testing.assert_array_equal(y2, lbls[:4].astype(np.int32))

    with pytest.raises(FileNotFoundError):
        load_mnist(str(tmp_path / "missing"), "train")


def test_load_cifar10_pickle_roundtrip(tmp_path):
    """load_cifar10 parses python-version batch pickles (CHW->HWC layout)."""
    import pickle

    from brevitas_tpu.examples.bnn_pynq import load_cifar10

    rng = np.random.default_rng(1)
    per_batch = 8
    raw = {}
    for i in range(1, 6):
        data = rng.integers(0, 256, (per_batch, 3 * 32 * 32)).astype(np.uint8)
        labels = rng.integers(0, 10, per_batch).tolist()
        raw[i] = (data, labels)
        with open(tmp_path / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
    test_data = rng.integers(0, 256, (per_batch, 3072)).astype(np.uint8)
    with open(tmp_path / "test_batch", "wb") as f:
        pickle.dump({b"data": test_data,
                     b"labels": rng.integers(0, 10, per_batch).tolist()}, f)

    x, y = load_cifar10(str(tmp_path), "train")
    assert x.shape == (5 * per_batch, 32, 32, 3) and x.dtype == np.float32
    assert y.shape == (5 * per_batch,)
    # CHW pickle layout lands in NHWC: red channel of image 0 of batch 1
    np.testing.assert_allclose(
        x[0, :, :, 0], raw[1][0][0, :1024].reshape(32, 32) / 255.0)
    xt, yt = load_cifar10(str(tmp_path), "test")
    assert xt.shape == (per_batch, 32, 32, 3)


# ---- real-dataset file loaders (bnn_pynq.load_mnist / load_cifar10) ---------
# Synthetic on-the-fly fixtures in the exact wire formats (idx / python
# pickle batches) so the parsers the MNIST/CIFAR-10 CLI uses are proven
# without shipping datasets (reference trainer data layer,
# src/brevitas_examples/bnn_pynq/trainer.py:126-160).


def _write_idx_images(path, arr, gz=False):
    import gzip
    import struct

    header = struct.pack(">HBB", 0, 0x08, arr.ndim)
    header += struct.pack(f">{arr.ndim}I", *arr.shape)
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(header + arr.astype(np.uint8).tobytes())


@pytest.mark.parametrize("gz", [False, True])
def test_load_mnist_idx_roundtrip(tmp_path, gz):
    from brevitas_tpu.examples.bnn_pynq import load_mnist

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (5, 28, 28)).astype(np.uint8)
    labels = np.array([3, 1, 4, 1, 5], np.uint8)
    ext = ".gz" if gz else ""
    _write_idx_images(tmp_path / f"train-images-idx3-ubyte{ext}", imgs, gz)
    _write_idx_images(tmp_path / f"train-labels-idx1-ubyte{ext}", labels, gz)
    _write_idx_images(tmp_path / f"t10k-images-idx3-ubyte{ext}", imgs[:2], gz)
    _write_idx_images(tmp_path / f"t10k-labels-idx1-ubyte{ext}", labels[:2],
                      gz)

    x, y = load_mnist(str(tmp_path), "train")
    assert x.shape == (5, 28, 28, 1) and x.dtype == np.float32
    np.testing.assert_array_equal(y, labels.astype(np.int32))
    np.testing.assert_allclose(x[..., 0], imgs.astype(np.float32) / 255.0)
    x2, y2 = load_mnist(str(tmp_path), "test")
    assert x2.shape == (2, 28, 28, 1) and list(y2) == [3, 1]


def test_load_mnist_missing_dir_raises(tmp_path):
    from brevitas_tpu.examples.bnn_pynq import load_mnist

    with pytest.raises(FileNotFoundError):
        load_mnist(str(tmp_path), "train")


def test_load_cifar10_pickle_batches(tmp_path):
    import pickle

    from brevitas_tpu.examples.bnn_pynq import load_cifar10

    rng = np.random.default_rng(0)
    n_per = 4
    all_data, all_labels = [], []
    for i in range(1, 6):
        data = rng.integers(0, 256, (n_per, 3072)).astype(np.uint8)
        labels = rng.integers(0, 10, n_per).tolist()
        with open(tmp_path / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        all_data.append(data)
        all_labels += labels
    # test batch inside the standard extracted directory name
    sub = tmp_path / "cifar-10-batches-py"
    sub.mkdir()
    tdata = rng.integers(0, 256, (3, 3072)).astype(np.uint8)
    with open(sub / "test_batch", "wb") as f:
        pickle.dump({b"data": tdata, b"labels": [7, 8, 9]}, f)

    x, y = load_cifar10(str(tmp_path), "train")
    assert x.shape == (5 * n_per, 32, 32, 3) and x.dtype == np.float32
    np.testing.assert_array_equal(y, np.asarray(all_labels, np.int32))
    # CHW pickle rows -> NHWC: red plane first in the row
    row0 = np.concatenate(all_data)[0].astype(np.float32) / 255.0
    np.testing.assert_allclose(x[0, :, :, 0], row0[:1024].reshape(32, 32))
    np.testing.assert_allclose(x[0, :, :, 2], row0[2048:].reshape(32, 32))
    xt, yt = load_cifar10(str(tmp_path), "test")
    assert xt.shape == (3, 32, 32, 3) and list(yt) == [7, 8, 9]
