# Convenience targets (the reference drives everything through
# `make build && make run` inside docker; here the runtime is pure
# Python/JAX plus one small C++ host-IO library).

PY ?= python

.PHONY: all native test test-fast bench bench-tpu demo clean

all: native

# C++ host IO runtime (bounded queues, image prefetcher, TUM writer)
native:
	cmake -S ur_mvo_tpu/native -B build/native -DCMAKE_BUILD_TYPE=Release
	cmake --build build/native -j
	cp build/native/liburmvo_io.so ur_mvo_tpu/native/

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

bench:
	$(PY) bench.py --platform cpu --tiny

bench-tpu:
	$(PY) bench.py

# end-to-end demo: synthetic dataset -> VO -> ATE (no external data or
# weights needed; uses the in-repo from-scratch checkpoint)
demo:
	$(PY) scripts/make_synthetic_dataset.py --out /tmp/urmvo_demo --frames 30
	$(PY) scripts/run_vo.py --images /tmp/urmvo_demo --gt /tmp/urmvo_demo/gt.txt \
	    --platform cpu --results /tmp/urmvo_demo_out --stride 1 \
	    --weights weights/superpoint_scratch_v3.npz --matcher nn

clean:
	rm -rf build
