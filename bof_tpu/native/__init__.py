"""C++ sources of the native I/O engine + pin cache (built lazily by
bof_tpu.io.native.load_library; shipped as package data so installed
copies can self-build)."""
