# Developer entry points (reference: Makefile with build/test/profile targets).

.PHONY: all native test test-fast test-nightly bench clean lint

all: native

native:
	cmake -B tools/build tools -G Ninja
	ninja -C tools/build

# three test tiers (no coverage tooling in the image, so the tiers are the
# substitute for the reference's coverage gate):
#   test         — default: everything except `slow` (~18 min CPU)
#   test-fast    — CI-iteration tier: also skips the `nightly`-marked heavy
#                  gates/equivalence tests (~10 min); fast meta-gates still
#                  verify the committed checkpoints
#   test-nightly — the whole suite including `slow`
test:
	python -m pytest tests/ -q -m "not slow"

test-fast:
	python -m pytest tests/ -q -m "not slow and not nightly"

test-nightly:
	python -m pytest tests/ -q

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

clean:
	rm -rf tools/build .jax_cache
