# Convenience targets (the package itself is pure Python + JAX).

PYTHON ?= python

.PHONY: test bench baseline capi clean

test:
	$(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

# C ABI shared library (reference interfaces.h analogue; embeds CPython)
capi: lib/libpolychordlite_tpu.so

lib/libpolychordlite_tpu.so: csrc/capi.c csrc/capi.h
	mkdir -p lib
	gcc -O2 -shared -fPIC $(shell python3-config --includes) -o $@ csrc/capi.c 		$(shell python3-config --embed --ldflags)

# native single-core baseline used by bench.py
baseline: /tmp/slice_baseline_bench

/tmp/slice_baseline_bench: csrc/slice_baseline.c
	gcc -O3 -march=native -o $@ $< -lm

clean:
	rm -rf /tmp/slice_baseline_bench polychordlite_tpu/**/__pycache__
