# Convenience targets (the Python package also lazily builds the native
# engine on import).

CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -shared -fPIC -pthread

bof_tpu/native/libbof_io.so: bof_tpu/native/bof_io.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

.PHONY: native test bench clean
native: bof_tpu/native/libbof_io.so

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

clean:
	rm -f bof_tpu/native/libbof_io.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
