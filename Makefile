.PHONY: test bench dryrun native clean

# Default: parallel across CPUs for the bulk of the suite (pytest-xdist),
# then the slow tests (throughput measurements, multi-process sims) SERIAL —
# their wall-clock assertions and jax.distributed port binds need a quiet
# host.  Port isolation: scripts/multihost_sim.py binds port 0 (kernel picks
# a free port), tmpdirs are pytest-managed per-worker.
test:
	python -m pytest tests/ -q -m "not slow" -n auto
	python -m pytest tests/ -q -m slow

test-serial:
	python -m pytest tests/ -q

bench:
	python bench.py

dryrun:
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

native:
	sh native/build.sh

clean:
	rm -rf .jax_cache .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +

test-fast:
	python -m pytest tests/ -q -m "not slow"
