# fugue-tpu development targets (reference parity: the reference drives its
# workflow through a Makefile with an 80% coverage bar, Makefile:13-14)

PY ?= python

.PHONY: test test-fast bench dryrun coverage examples clean

test:
	$(PY) -m pytest tests/ -q -n 2

test-fast:
	$(PY) -m pytest tests/test_smoke.py tests/test_public_api.py -q

bench:
	$(PY) bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
		$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# requires pytest-cov (not in the baked image; install in dev environments)
coverage:
	$(PY) -m pytest tests/ -q -n 2 --cov=fugue_tpu --cov-report=term-missing \
		--cov-fail-under=80

examples:
	@for f in examples/*.py; do \
		echo "== $$f =="; \
		JAX_PLATFORMS=cpu $(PY) -c "import jax; jax.config.update('jax_platforms','cpu'); jax.config.update('jax_enable_x64', True); import runpy; runpy.run_path('$$f', run_name='__main__')" || exit 1; \
	done

clean:
	rm -rf .pytest_cache fugue_tpu/utils/_fugue_host.so
	find . -name __pycache__ -type d -exec rm -rf {} +
