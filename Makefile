# Developer entry points (reference: Makefile with build/test/profile targets).

.PHONY: all native test test-fast bench clean lint

all: native

native:
	cmake -B tools/build tools -G Ninja
	ninja -C tools/build

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

clean:
	rm -rf tools/build .jax_cache
