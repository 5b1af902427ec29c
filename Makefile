# Convenience targets (the Python package also lazily builds the native
# engine on import).

CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -shared -fPIC -pthread

native/libbof_io.so: native/bof_io.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

.PHONY: native test bench clean
native: native/libbof_io.so

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

clean:
	rm -f native/libbof_io.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
