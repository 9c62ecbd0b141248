# Development targets (tox.ini / local_run_test.sh equivalents).
.PHONY: test test-fast native bench lint clean export serve-example \
	parity-real parity-real-smoke

# Real-weight drop-in drill: convert --verify -> full 15-category sweep ->
# evaluate -> diff vs the reference's published tau_result.csv.  Reports
# cleanly when the checkpoint / MVTec dataset are absent (zero-egress
# environments); see scripts/parity_real.py.
parity-real:
	python scripts/parity_real.py

parity-real-smoke:
	python scripts/parity_real.py --smoke

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

# AOT serving round trip: export the flagship artifact, then serve it
# from a host process that never imports tpu_ac (see TUTORIAL.md §7)
export:
	python -m tpu_ac.cli.export --n_images 32 --output serving.tpuac \
		--dump_params params.npy

serve-example:
	python scripts/serving_host.py serving.tpuac --params params.npy --bench

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
