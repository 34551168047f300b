# Convenience targets (the package itself is pure Python + JAX).

PYTHON ?= python

.PHONY: test bench baseline clean

test:
	$(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

# native single-core baseline used by bench.py
baseline: /tmp/slice_baseline_bench

/tmp/slice_baseline_bench: csrc/slice_baseline.c
	gcc -O3 -march=native -o $@ $< -lm

clean:
	rm -rf /tmp/slice_baseline_bench polychordlite_tpu/**/__pycache__
