# CLI drivers (reference: drivers/ + misc/ — 15 executables and tooling).
# Each module has a main(); run as `python -m bof_tpu.drivers.<name>`.
