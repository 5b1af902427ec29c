"""Unit coverage for the driver-entry helpers in __graft_entry__.py.

The dryrun itself runs as a subprocess in test_multiprocess-adjacent
flows and via the external driver; here we pin the pure helpers — in
particular the cpu_aot_loader noise scrub, whose contract is narrow:
drop ONLY the same-machine '+prefer-*' pseudo-feature false positives,
pass every real warning through.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge

_PSEUDO = ("E0819 05:48:16.452086 1192 cpu_aot_loader.cc:210] Loading "
           "XLA:CPU AOT result. Target machine feature +prefer-no-scatter "
           "is not  supported on the host machine. ... could lead to "
           "execution errors such as SIGILL.\n")
_REAL = ("E0819 05:48:16.452086 1192 cpu_aot_loader.cc:210] Loading "
         "XLA:CPU AOT result. Target machine feature +avx512f is not  "
         "supported on the host machine. ... could lead to execution "
         "errors such as SIGILL.\n")


def test_scrub_drops_pseudo_feature_lines_only():
    out = "phase a ok\n" + _PSEUDO + "phase b ok\n"
    scrubbed = ge._scrub_aot_pseudo_feature_noise(out)
    assert "prefer-no-scatter" not in scrubbed
    assert "phase a ok" in scrubbed and "phase b ok" in scrubbed
    # one audit note replaces the dropped line(s)
    assert "scrubbed 1 cpu_aot_loader" in scrubbed


def test_scrub_passes_real_isa_mismatch_through():
    out = "phase a ok\n" + _REAL
    scrubbed = ge._scrub_aot_pseudo_feature_noise(out)
    assert "+avx512f" in scrubbed  # a REAL mismatch must stay visible
    assert "scrubbed" not in scrubbed


def test_scrub_noop_on_clean_output():
    out = "phase a ok\ndryrun_multichip OK on 8 devices\n"
    assert ge._scrub_aot_pseudo_feature_noise(out) == out


def test_stderr_fd_scrub_inprocess_path(capfd):
    # the in-process dryrun path captures OS-level fd 2 (XLA's C++ logs
    # bypass sys.stderr); pseudo-feature lines written straight to the fd
    # must be scrubbed, real content re-emitted
    with ge._scrubbed_stderr_fd():
        os.write(2, _PSEUDO.encode())
        os.write(2, b"real stderr line\n")
    got = capfd.readouterr().err
    assert "prefer-no-scatter" not in got
    assert "real stderr line" in got
    assert "scrubbed 1 cpu_aot_loader" in got


def test_machine_sig_stable_and_short():
    a, b = ge._machine_sig(), ge._machine_sig()
    assert a == b and len(a) == 12


def test_scrubbed_env_pins_cpu_and_device_count():
    env = ge._scrubbed_cpu_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "axon" not in env.get("PYTHONPATH", "")
    # the dryrun-private, machine-keyed compile cache dir
    assert ge._machine_sig() in env["JAX_COMPILATION_CACHE_DIR"]
