# Development targets (tox.ini / local_run_test.sh equivalents).
.PHONY: test test-fast native bench lint clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_golden_parity.py

native:
	$(MAKE) -C native

bench:
	python bench.py

entry-check:
	python __graft_entry__.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
