"""Superblock-granular gemm restartability (resume_journal).

Beyond the reference, which is restartable only at kernel boundaries
(SURVEY §5 checkpoint/resume): a journaled gemm killed with SIGKILL
mid-run resumes by skipping exactly the C superblocks whose bytes are
already fsync-durable, and the resumed output is BYTE-identical to an
uninterrupted run (the per-block K-chain order is deterministic).
"""
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "gemm_resume_worker.py")
N, BLK = 512, 64  # 8x8 C superblocks, 8-step K chains


def _write_operands(workdir, ctx):
    import bof_tpu as bt
    rng = np.random.default_rng(42)
    for name, seed in (("A.bin", 1), ("B.bin", 2)):
        arr = bt.map_array(os.path.join(workdir, name), (N, N),
                           np.float32, "R", create=True, ctx=ctx)
        arr.write_all(rng.standard_normal((N, N)).astype(np.float32))


def _launch(workdir):
    env = dict(os.environ)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    if REPO not in pp:
        pp.insert(0, REPO)
    env["PYTHONPATH"] = os.pathsep.join(pp)
    return subprocess.Popen(
        [sys.executable, WORKER, workdir, str(N), str(BLK)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def _journal_data_lines(path):
    try:
        with open(path) as f:
            return max(0, sum(1 for _ in f) - 1)  # minus the header
    except OSError:
        return 0


def test_gemm_kill_and_resume(ctx, tmp_path):
    ref_dir = str(tmp_path / "ref")
    kill_dir = str(tmp_path / "kill")
    os.makedirs(ref_dir)
    os.makedirs(kill_dir)
    _write_operands(ref_dir, ctx)
    # same operand BYTES in both dirs so the outputs are comparable
    for name in ("A.bin", "B.bin"):
        with open(os.path.join(ref_dir, name), "rb") as f:
            data = f.read()
        with open(os.path.join(kill_dir, name), "wb") as f:
            f.write(data)

    # uninterrupted reference run (same worker code path)
    p = _launch(ref_dir)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0 and "GEMM_DONE" in out, out

    # killed run: SIGKILL once >= 2 superblocks are journaled durable
    journal = os.path.join(kill_dir, "journal.txt")
    p = _launch(kill_dir)
    deadline = time.time() + 240
    try:
        while time.time() < deadline:
            if _journal_data_lines(journal) >= 2:
                break
            if p.poll() is not None:
                break
            time.sleep(0.02)
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)
    finally:
        if p.poll() is None:
            p.kill()
    done_at_kill = _journal_data_lines(journal)
    if p.returncode == 0:  # box too fast: the run finished before the kill
        pytest.skip("gemm completed before the kill window")
    assert done_at_kill >= 1, "kill landed before any block was journaled"
    assert done_at_kill < 64, "kill landed after completion"

    # resume: must skip the journaled blocks and complete
    p = _launch(kill_dir)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0 and "GEMM_DONE" in out, out
    assert not os.path.exists(journal), "journal must be removed on success"

    # byte-identical output, and correct vs the float64 golden
    got = np.fromfile(os.path.join(kill_dir, "C.bin"), np.float32)
    want = np.fromfile(os.path.join(ref_dir, "C.bin"), np.float32)
    np.testing.assert_array_equal(got, want)
    a = np.fromfile(os.path.join(ref_dir, "A.bin"),
                    np.float32).reshape(N, N)
    b = np.fromfile(os.path.join(ref_dir, "B.bin"),
                    np.float32).reshape(N, N)
    gold = (a.astype(np.float64) @ b.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(got.reshape(N, N), gold, rtol=2e-4,
                               atol=1e-3)


def test_journal_torn_lines_ignored(tmp_path):
    """A power-loss tear can truncate a TOKEN, not just drop one:
    '12 34\\n' torn to '12 3' still splits into two parts — only a line
    with its trailing newline intact may mark a superblock done
    (accepting '12 3' would skip a never-computed block on resume)."""
    from bof_tpu.ops.gemm import _load_journal
    jp = str(tmp_path / "j.txt")
    with open(jp, "w") as f:
        f.write("HDR\n0 1\n2 3\n12 3")  # last line torn mid-token
    assert _load_journal(jp, "HDR") == {(0, 1), (2, 3)}
    with open(jp, "w") as f:
        f.write("HDR\n0 1\n2")  # torn to a single token
    assert _load_journal(jp, "HDR") == {(0, 1)}


def test_resume_journal_guards(ctx, tmp_path):
    import bof_tpu as bt
    from bof_tpu.ops.gemm import gemm
    n = 64
    rng = np.random.default_rng(0)
    A = bt.mem_array((n, n), np.float32,
                     data=rng.standard_normal((n, n)).astype(np.float32),
                     ctx=ctx)
    C = bt.mem_array((n, n), np.float32, ctx=ctx)
    jp = str(tmp_path / "j.txt")
    # beta != 0 is rejected (partial writes would poison the re-read)
    with pytest.raises(ValueError, match="beta"):
        gemm(A, A, C, beta=0.5, blk=32, ctx=ctx, resume_journal=jp)
    # header mismatch is an error, not a silent skip
    with open(jp, "w") as f:
        f.write('{"some": "other problem"}\n0 0\n')
    with pytest.raises(ValueError, match="different gemm call"):
        gemm(A, A, C, blk=32, ctx=ctx, resume_journal=jp)
    os.unlink(jp)
    # a journaled run that completes removes its journal and is correct
    gemm(A, A, C, blk=32, ctx=ctx, resume_journal=jp)
    assert not os.path.exists(jp)
    a_np = A.read_all()
    np.testing.assert_allclose(
        C.read_all(), (a_np.astype(np.float64) @ a_np).astype(np.float32),
        rtol=2e-4, atol=1e-3)
