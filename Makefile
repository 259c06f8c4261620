# Build system (reference: top-level makefile driving nvcc).
# The TPU compute path compiles via XLA at runtime; `native` builds the C++
# host components (data loader).

PY ?= python
CXX ?= g++
CXXFLAGS ?= -O3 -shared -fPIC -std=c++17

NATIVE_SO = tpu_raytracing/scene/_objloader.so

all: native

native: $(NATIVE_SO)

$(NATIVE_SO): csrc/objloader.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

format:
	$(PY) -m black tpu_raytracing tests 2>/dev/null || true

clean:
	rm -f $(NATIVE_SO)
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

.PHONY: all native test bench format clean
