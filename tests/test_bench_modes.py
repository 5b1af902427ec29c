"""bench.py mode smoke tests.

The driver runs `python bench.py` at round end as the recorded perf
artifact; a regression in any BOF_BENCH_KERNEL mode would otherwise only
surface there.  Each mode runs here at toy size on the CPU backend and
must print exactly one JSON line with the metric/value/unit/vs_baseline
keys and verified=true.  All modes run concurrently (distinct operand
shapes, uuid scratch files) so the wall cost is one bench, not five.
"""
import json
import os
import subprocess
import sys

import pytest

# ~6 min of subprocess bench runs (every mode at toy size): the heaviest
# module in the suite, opt-in via BOF_SLOW=1 (tests/conftest.py) — run it
# after any bench.py or kernel-pipeline change
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = {
    "sgemm": {"BOF_BENCH_N": "1024", "BOF_BENCH_BLK": "512",
              "BOF_BENCH_CSRMM": "0", "BOF_BENCH_TERTIARY": "0",
              "BOF_BENCH_XFER": "0"},
    # full default artifact shape at toy size: gemm headline + csrmm
    # secondary + one tertiary kernel in a single JSON line
    "sgemm_full": {"BOF_BENCH_N": "1024", "BOF_BENCH_BLK": "512",
                   # generous budget: all 6 modes run concurrently here,
                   # and contention wall-time must not trip the
                   # tertiary/skip gates that govern the real 240s run
                   "BOF_BENCH_BUDGET_S": "1800",
                   "BOF_BENCH_KERNEL": "sgemm",
                   "BOF_BENCH_SP_M": "4096", "BOF_BENCH_SP_K": "1024",
                   "BOF_BENCH_SP_NNZ": "16", "BOF_BENCH_SP_N": "64",
                   "BOF_BENCH_KM_N": "16384", "BOF_BENCH_KM_D": "8",
                   "BOF_BENCH_KM_K": "8", "BOF_BENCH_SORT_N": "65536"},
    "csrmm": {"BOF_BENCH_SP_M": "4096", "BOF_BENCH_SP_K": "1024",
              "BOF_BENCH_SP_NNZ": "16", "BOF_BENCH_SP_N": "64"},
    "csrgemv": {"BOF_BENCH_SP_M": "5000", "BOF_BENCH_SP_K": "1000",
                "BOF_BENCH_SP_NNZ": "12"},
    "kmeans": {"BOF_BENCH_KM_N": "16384", "BOF_BENCH_KM_D": "8",
               "BOF_BENCH_KM_K": "8"},
    "csrcsc_sort": {"BOF_BENCH_SP_M": "3000", "BOF_BENCH_SP_K": "500",
                    "BOF_BENCH_SP_NNZ": "8", "BOF_BENCH_SORT_N": "65536"},
    "map_reduce": {"BOF_BENCH_MR_N": "65536"},
    "io": {"BOF_BENCH_IO_GB": "0.1"},  # clamps to the 64 MiB floor
    # Program-Cache pressure A/B at toy scale (VERDICT r4 #2): working
    # set 4x budget, so evictions/write-backs/backlog must all engage
    "cache": {"BOF_BENCH_CACHE_N": "1024", "BOF_BENCH_CACHE_BLK": "256"},
    # device-resident regression rows at toy shape (VERDICT r4 #7)
    "device": {"BOF_BENCH_DEV_SB": "512", "BOF_BENCH_DEV_ITERS": "2"},
    # disk-axis pressure proof at toy scale (VERDICT r4 #8): ws 12 MB,
    # budget ~1.2 MB -> journal + evictions machinery engages
    "oocdisk": {"BOF_BENCH_DISK_N": "1024", "BOF_BENCH_DISK_BLK": "256"},
    "fp64": {"BOF_BENCH_FP64_N": "512", "BOF_BENCH_FP64_BLK": "256"},
}


@pytest.fixture(scope="module")
def bench_results(tmp_path_factory):
    home = tmp_path_factory.mktemp("bench_home")
    procs = {}
    for mode, extra in MODES.items():
        env = dict(os.environ)
        env["HOME"] = str(home)  # isolates ~/.cache/bof_tpu/bench
        env["BOF_BENCH_KERNEL"] = mode
        # per-mode full-telemetry sidecar (the "last" defaults collide
        # when two sgemm-mode runs share a HOME)
        env["BOF_BENCH_SIDECAR"] = str(home / f"sidecar_{mode}.json")
        env.update(extra)
        procs[mode] = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
    out = {}
    for mode, p in procs.items():
        stdout, stderr = p.communicate(timeout=900)
        out[mode] = (p.returncode, stdout, stderr,
                     str(home / f"sidecar_{mode}.json"))
    return out


@pytest.mark.parametrize("mode", list(MODES))
def test_bench_mode(bench_results, mode):
    rc, stdout, stderr, sidecar = bench_results[mode]
    assert rc == 0, f"{mode} rc={rc}\n{stdout}\n{stderr[-2000:]}"
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"{mode}: expected ONE JSON line, got {lines!r}"
    # the printed line must survive the driver's 2000-char tail capture
    # (VERDICT r4 #1) and end with the duplicated headline keys
    assert len(lines[0]) <= 2000, f"{mode}: line {len(lines[0])} chars"
    r = json.loads(lines[0])
    tail = lines[0][-400:]
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in r, f"{mode}: missing {key} in {r}"
        assert f'"{key}":' in tail, f"{mode}: {key} not near line end"
    assert r["verified"] is True
    assert r["value"] > 0
    # the full telemetry must live in the sidecar, self-describing
    with open(sidecar) as f:
        side = json.load(f)
    full = side["result"]
    assert full["metric"] == r["metric"]
    assert full["value"] == r["value"]
    if mode == "sgemm_full":
        # the recorded line must carry the sparse secondary AND a
        # tertiary kernel alongside the gemm headline (VERDICT r2 #1/#7)
        assert "csrmm_gbps" in r, r
        assert r.get("csrmm_verified") is True
        # ...and the compressed-transfer gemm secondary (int8 link bytes)
        assert r.get("xfer", {}).get("verified") is True, r
        assert r.get("xfer", {}).get("n"), r
        # the secondary self-labels its n decision (a wall-budget shrink
        # below the headline n on a degraded-link day must be readable
        # from the line, not mistaken for the r04 inherit-n bug)
        assert r.get("xfer", {}).get("sized") in (
            "env", "grown", "headline_n", "wall_budget_shrink"), r
        assert r.get("tertiary", {}).get("kernel"), r
        # self-labeling artifact (VERDICT r3 #1): the window grades
        # itself from its own evidence
        assert r.get("link_verdict") in ("saturated", "tunnel_degraded",
                                         "pipeline_bubble"), r
        # truthful-telemetry invariant: synced per-stage rates are real
        # transfer rates, present as per-tile samples — in the SIDECAR
        assert full.get("telemetry_sync") is True
        assert full.get("h2d_tile_gbps"), full.keys()
        assert "accum_wait" in full.get("stall_s", {}), full.keys()
        assert "busy_frac" in full.get("link_verdict_evidence", {})
        assert full.get("gemm_xfer", {}).get("verified") is True
        assert "tertiary_error" not in full, full.get("tertiary_error")
    if mode == "fp64":
        assert r["metric"] == "ooc_fp64_gemm_gflops"
        assert r["fp64_max_scaled_err"] < 1e-12
    if mode == "cache":
        # the pressure machinery must actually engage: evictions, dirty
        # write-backs, and backlog depth all non-zero (VERDICT r4 #2 —
        # every earlier recorded round had evictions: 0)
        assert r["evictions"] > 0 and r["evict_dirty"] > 0, r
        assert r["writeback_gb"] > 0 and r["max_backlog"] > 0, r
        assert r["ws_over_budget"] >= 4, r
        for tag, run in full["runs"].items():
            assert run["ok"] and run["evictions"] > 0, (tag, run)
    if mode == "oocdisk":
        assert r["ws_over_budget"] >= 10, r
        assert r["tile_cache"]["evictions"] > 0, r
        assert r["journal_consumed"] is True, r
        # both probes present: only the end probe shares the run's
        # vdisk burst-credit state (the roofline comparator)
        assert r["probe_seq_read_gbps"] > 0, r
        assert r["probe_seq_read_gbps_end"] > 0, r
    if mode == "device":
        # every capability row present and positive (pallas row is
        # TPU-only and absent on the CPU backend)
        for row in ("fp32_highest_tflops", "fp32_default_tflops",
                    "bf16_tflops", "int8_tflops", "fp64_step_tflops"):
            assert r.get(row, 0) > 0, (row, r)
        assert r["device_backend"] == "cpu"
        # batched windows (one fori_loop dispatch per K steps) are the
        # methodology — single-dispatch windows floored at the ~2.2 ms
        # per-dispatch tunnel cost and under-read the fast rows 3-5x
        assert r.get("device_window_steps", 0) >= 2, r


def test_emit_line_fits_tail_capture(tmp_path, capsys, monkeypatch):
    """emit() must keep the printed line under the driver's 2000-char
    tail capture even when handed a bloated result (VERDICT r4 #1), drop
    optional keys from the END first, never drop the headline keys, and
    repeat them as the line's final keys.  The full result must land in
    the sidecar regardless."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod2", os.path.join(REPO, "bench.py"))
    b = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(b)
    monkeypatch.setenv("BOF_BENCH_SIDECAR", str(tmp_path / "side.json"))
    # emit() ALSO always writes CACHE_DIR/full_<kernel>_last.json — point
    # it at the tmp dir so this in-process test cannot replace the cached
    # copy of the last real chip run's telemetry with dummy data
    monkeypatch.setattr(b, "CACHE_DIR", str(tmp_path))
    full = {"metric": "m", "value": 1.5, "unit": "u", "vs_baseline": 0.5,
            "link_verdict": "saturated", "verified": True}
    for i in range(200):
        full[f"bulk_{i:03d}"] = {"x": i, "samples": list(range(16))}
    compact = dict(full)
    b.emit(full, compact, kernel="sgemm")
    line = capsys.readouterr().out.strip()
    assert len(line) <= b._MAX_LINE
    r = json.loads(line)
    assert r["metric"] == "m" and r["value"] == 1.5
    assert r["verified"] is True and r["link_verdict"] == "saturated"
    # duplicated tail keys present at the very end
    assert line.rstrip("}").endswith('"verified":true')
    # the full result survives in the sidecar
    side = json.load(open(tmp_path / "side.json"))
    assert side["result"]["bulk_199"]["samples"][-1] == 15
    # the sidecar pointer must survive an overflow drop — it is exactly
    # the overflowing line whose telemetry lives only in the sidecar
    assert r["sidecar"] == str(tmp_path / "side.json")


def test_emit_sidecar_kernel_keying(tmp_path, capsys, monkeypatch):
    """Unredirected repo sidecars are KERNEL-KEYED: a later io/device/
    cache run must not overwrite the committed headline sgemm telemetry
    (last-writer-wins was destroying it), and an error stub must write
    NO repo artifact at all."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod3", os.path.join(REPO, "bench.py"))
    b = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(b)
    monkeypatch.delenv("BOF_BENCH_SIDECAR", raising=False)
    monkeypatch.setattr(b, "CACHE_DIR", str(tmp_path / "cache"))
    # emit() derives the repo dir from bench's __file__ — point it at a
    # scratch "repo" so the test never touches the real docs/artifacts
    monkeypatch.setattr(b, "__file__", str(tmp_path / "bench.py"))
    art = tmp_path / "docs" / "artifacts"
    base = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 0.0}
    b.emit(dict(base), kernel="io")
    line = json.loads(capsys.readouterr().out.strip())
    assert line["sidecar"] == "docs/artifacts/bench_full_io_last.json"
    assert (art / "bench_full_io_last.json").exists()
    assert not (art / "bench_full_last.json").exists()
    b.emit(dict(base), kernel="sgemm")
    head_line = json.loads(capsys.readouterr().out.strip())
    assert head_line["sidecar"] == "docs/artifacts/bench_full_last.json"
    before = (art / "bench_full_last.json").read_text()
    b.emit({**base, "metric": "error", "error": "boom"}, kernel="error")
    err_line = json.loads(capsys.readouterr().out.strip())
    # headline sidecar untouched, no repo error stub, pointer names the
    # CACHE_DIR copy that WAS written
    assert (art / "bench_full_last.json").read_text() == before
    assert not list(art.glob("*error*"))
    assert err_line["sidecar"].endswith("full_error_last.json")
    assert json.load(open(err_line["sidecar"]))["result"]["error"] == "boom"


def test_link_verdict_rules():
    """The artifact's self-grading decision rule (VERDICT r3 #1),
    exercised directly: saturated / tunnel_degraded / pipeline_bubble."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    b = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(b)
    # busy channel, tile rates tracking the probes: saturated
    assert b.link_verdict(0.99, 0.040, 0.045, 0.040) == "saturated"
    # busy channel, tile rates far below the probes: mid-run collapse
    assert b.link_verdict(0.99, 0.008, 0.043, 0.040) == "tunnel_degraded"
    # idle channel: the pipeline, not the link, is the bottleneck
    assert b.link_verdict(0.30, 0.040, 0.045, 0.040) == "pipeline_bubble"
    # a probe taken on an already-collapsed channel must not grade its
    # own run healthy: the prior saturated sustained rate is the bar
    assert b.link_verdict(0.99, 0.005, 0.006, 0.040) == "tunnel_degraded"
    # no prior history: the probes alone decide
    assert b.link_verdict(0.99, 0.005, 0.006, 0.0) == "saturated"


def test_blk_auto_shrink_exercises_hbm_lru(tmp_path):
    """When self-sizing lands on few superblocks and BOF_BENCH_BLK is
    unset, bench shrinks blk to n/4 so the recorded hbm_tier measures a
    real B-panel-reuse LRU pattern (VERDICT r3 #6): a 4x4x4 grid makes
    hits strictly dominate misses (each tile re-used across sweeps)."""
    env = dict(os.environ)
    env["HOME"] = str(tmp_path)
    env["BOF_BENCH_SIDECAR"] = str(tmp_path / "sidecar.json")
    env.pop("BOF_BENCH_BLK", None)
    env.update({"BOF_BENCH_N": "4096", "BOF_BENCH_CSRMM": "0",
                "BOF_BENCH_TERTIARY": "0", "BOF_BENCH_XFER": "0",
                "BOF_BENCH_BUDGET_S": "1800"})
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, timeout=900)
    assert p.returncode == 0, p.stderr[-2000:]
    r = json.loads(p.stdout.strip().splitlines()[-1])
    assert r["verified"] is True
    assert r["blk"] == 1024, r
    with open(tmp_path / "sidecar.json") as f:
        full = json.load(f)["result"]
    assert full.get("blk_auto_shrunk") is True, full.keys()
    hbm = full["hbm_tier"]
    assert hbm["hits"] > hbm["misses"] > 0, hbm


def test_bench_attach_failure_artifact(tmp_path):
    """Bad-relay round-end insurance: when the device backend cannot
    initialize (the documented 'Unable to initialize backend ...
    Unavailable' failure), bench must still print exactly one
    diagnosable JSON line — including one re-exec retry — instead of
    dying with a stack trace and leaving the round with no artifact."""
    env = dict(os.environ)
    env["HOME"] = str(tmp_path)
    # redirect the sidecar: without it this error artifact would
    # os.replace the committed docs/artifacts/bench_full_last.json
    env["BOF_BENCH_SIDECAR"] = str(tmp_path / "err_side.json")
    env["JAX_PLATFORMS"] = "fakeplat"  # forces the init RuntimeError
    env["BOF_BENCH_ATTACH_RETRIES"] = "1"
    env["BOF_BENCH_ATTACH_SLEEP_S"] = "0"
    env["BOF_BENCH_IO_ON_FAIL"] = "0"  # keep the test fast
    # scrub the axon sitecustomize: it would re-pin JAX_PLATFORMS
    env["PYTHONPATH"] = REPO
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, timeout=300)
    assert p.returncode == 1, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got {lines!r}"
    r = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in r
    assert r["metric"] == "error"
    assert "nitialize backend" in r["error"]
    assert r["attach_attempts"] == 2  # original + one re-exec retry
    assert "device_attach_s" in r


def test_cache_medians_tool(tmp_path):
    """tools/cache_medians.py — the paired multi-run estimator behind the
    prioritizer wall-ratio claim (single-sample walls swing 0.43-1.15x on
    this vdisk) — must run a pair at toy scale, keep the pressure
    machinery engaged (evictions in both arms), and emit one JSON line
    with the median/min/max ratio fields."""
    env = dict(os.environ)
    env["HOME"] = str(tmp_path)  # isolates CACHE_DIR operands
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cache_medians.py"),
         "--pairs", "1", "--n", "1024", "--blk", "256", "--no-artifact"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, timeout=600)
    assert p.returncode == 0, p.stderr[-2000:]
    r = json.loads(p.stdout.strip().splitlines()[-1])
    assert r["all_ok"] is True
    assert r["evictions_min"] > 0
    assert r["ws_over_budget"] >= 4
    assert len(r["pairs"]) == 1
    for key in ("fetch_ratio_median", "fetch_ratio_min", "fetch_ratio_max",
                "wall_ratio_median", "wall_ratio_min", "wall_ratio_max"):
        assert isinstance(r[key], float), (key, r[key])
    assert "artifact" not in r  # --no-artifact must not touch the repo
