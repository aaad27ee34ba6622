.PHONY: test bench dryrun native clean

test:
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
