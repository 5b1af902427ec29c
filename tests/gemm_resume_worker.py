"""Worker for the gemm kill-and-resume test (tests/test_gemm_resume.py).

Runs one journaled out-of-core gemm over pre-generated operand files.
The parent SIGKILLs this process mid-run, then relaunches it; the second
run must resume from the journal and produce a byte-identical C.

Usage: gemm_resume_worker.py <workdir> <n> <blk>
"""
import os
import sys

import numpy as np


def main() -> int:
    workdir, n, blk = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import bof_tpu as bt
    from bof_tpu.ops.gemm import gemm
    ctx = bt.FlashContext(bt.FlashConfig(
        scratch_dir=os.path.join(workdir, "scratch"),
        n_io_threads=2, n_compute_threads=1, pipeline_depth=2,
        program_budget=256 << 20))
    A = bt.map_array(os.path.join(workdir, "A.bin"), (n, n), np.float32,
                     "R", ctx=ctx)
    B = bt.map_array(os.path.join(workdir, "B.bin"), (n, n), np.float32,
                     "R", ctx=ctx)
    C = bt.map_array(os.path.join(workdir, "C.bin"), (n, n), np.float32,
                     "R", create=True, ctx=ctx)
    gemm(A, B, C, blk=blk, ctx=ctx,
         resume_journal=os.path.join(workdir, "journal.txt"))
    ctx.destroy()
    print("GEMM_DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
