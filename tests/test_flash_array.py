"""FlashArray block-access semantics (flash_ptr/map_file analog)."""
import numpy as np
import pytest

from bof_tpu import FlashArray, flash_empty, flash_free, map_array, mem_array


@pytest.mark.parametrize("order", ["R", "C"])
def test_roundtrip_blocks(order, ctx, rng):
    m, n = 64, 48
    ref = rng.standard_normal((m, n)).astype(np.float32)
    arr = mem_array((m, n), np.float32, order, data=ref, ctx=ctx)
    np.testing.assert_array_equal(arr.read_all(), ref)
    blk = arr.read_block(16, 32, 8, 24)
    np.testing.assert_array_equal(blk, ref[16:48, 8:32])
    patch = rng.standard_normal((10, 5)).astype(np.float32)
    arr.write_block(3, patch, 7)
    ref[3:13, 7:12] = patch
    np.testing.assert_array_equal(arr.read_all(), ref)


@pytest.mark.parametrize("order", ["R", "C"])
def test_file_backed(order, ctx, tmp_path, rng):
    m, n = 33, 21  # deliberately unaligned
    ref = rng.standard_normal((m, n)).astype(np.float32)
    path = str(tmp_path / "arr.bin")
    arr = map_array(path, (m, n), np.float32, order, create=True, ctx=ctx)
    arr.write_all(ref)
    arr.store.flush()
    arr2 = map_array(path, (m, n), np.float32, order, ctx=ctx)
    np.testing.assert_array_equal(arr2.read_all(), ref)
    np.testing.assert_array_equal(arr2.read_block(5, 11, 2, 13),
                                  ref[5:16, 2:15])
    arr.store.close()
    arr2.store.close()


def test_lda_subview(ctx, rng):
    """Sub-matrix of a larger on-disk matrix via ld (reference lda support)."""
    big = rng.standard_normal((40, 50)).astype(np.float32)
    arr = mem_array((40, 50), np.float32, "R", data=big, ctx=ctx)
    sub = FlashArray(arr.store, (20, 30), np.float32, "R",
                     offset=(4 * 50 + 6) * 4, ld=50, ctx=ctx)
    np.testing.assert_array_equal(sub.read_all(), big[4:24, 6:36])
    patch = rng.standard_normal((20, 30)).astype(np.float32)
    sub.write_all(patch)
    got = arr.read_all()
    np.testing.assert_array_equal(got[4:24, 6:36], patch)


def test_scratch_alloc(ctx):
    arr = flash_empty((100,), np.float32, ctx=ctx)
    arr.write_all(np.arange(100, dtype=np.float32))
    np.testing.assert_array_equal(arr.read_all(),
                                  np.arange(100, dtype=np.float32))
    flash_free(arr)


def test_1d_vec_view(ctx):
    arr = mem_array((100,), np.int32, data=np.arange(100, dtype=np.int32),
                    ctx=ctx)
    v = arr.vec_view(10, 20)
    np.testing.assert_array_equal(v.read_all(),
                                  np.arange(10, 30, dtype=np.int32))


def test_as_memmap_raw_access(ctx, tmp_path, rng):
    """get_raw_ptr analog: direct mmap host access to a file array."""
    import numpy as np
    from bof_tpu import map_array
    ref = rng.standard_normal((20, 12)).astype(np.float32)
    arr = map_array(str(tmp_path / "mm.bin"), (20, 12), np.float32, "R",
                    create=True, ctx=ctx)
    arr.write_all(ref)
    arr.store.flush()
    mm = arr.as_memmap()
    np.testing.assert_array_equal(np.asarray(mm), ref)
    mm[3, 4] = 42.0
    mm.flush()
    assert arr.read_block(3, 1, 4, 1)[0, 0] == 42.0
    # column-major view transposes correctly
    arr_c = map_array(str(tmp_path / "mmc.bin"), (7, 9), np.float32, "C",
                      create=True, ctx=ctx)
    arr_c.write_all(ref[:7, :9])
    arr_c.store.flush()
    np.testing.assert_array_equal(np.asarray(arr_c.as_memmap()),
                                  ref[:7, :9])


def test_as_memmap_honors_ld(ctx, tmp_path, rng):
    """as_memmap over an ld-padded sub-matrix must view only the
    sub-matrix bytes (a contiguous map read/wrote the parent's
    neighbors)."""
    from bof_tpu import FlashArray, map_array
    parent_np = rng.standard_normal((10, 12)).astype(np.float32)
    path = str(tmp_path / "mm.bin")
    parent_np.tofile(path)
    parent = map_array(path, (10, 12), np.float32, "R", ctx=ctx)
    it = 4
    sub = FlashArray(parent.store, (4, 5), np.float32, "R",
                     offset=(2 * 12 + 3) * it, ld=12, ctx=ctx)
    mm = sub.as_memmap(mode="r")
    np.testing.assert_array_equal(np.asarray(mm), parent_np[2:6, 3:8])
    # writes through the strided view stay inside the sub-matrix
    mm2 = sub.as_memmap(mode="r+")
    mm2[:] = 7.0
    del mm2
    got = np.fromfile(path, np.float32).reshape(10, 12)
    want = parent_np.copy()
    want[2:6, 3:8] = 7.0
    np.testing.assert_array_equal(got, want)
